#!/usr/bin/env bash
# Hi-Fi-CAPTAIN (48 kHz, Japanese) AAS-VC recipe (mirrors the reference
# egs/hificaptain_jp/vc2). Same stage structure as egs/arctic/vc2 with
# 48 kHz feature settings and batch 2 x grad-accum 8 (reference OOM
# guidance). Point db_root at the Hi-Fi-CAPTAIN download.
set -euo pipefail

stage=0
stop_stage=100
n_jobs=8
conf=conf/aas_vc.melmelmel.v1.yaml
srcspk=male
trgspk=female
db_root=downloads/hi-fi-captain
dumpdir=dump
expdir=exp
tag=aas_vc.melmelmel.v1

repo_root=$(cd "$(dirname "$0")/../../.." && pwd)
. "$repo_root/utils/parse_options.sh"
cd "$(dirname "$0")"
export PYTHONPATH="$repo_root:${PYTHONPATH:-}"
train_cmd="python3 $repo_root/utils/run_jobs.py"

if [ "$stage" -le -1 ] && [ "$stop_stage" -ge -1 ]; then
  echo "=== stage -1: download"
  local/data_download.sh "$db_root"
fi

if [ "$stage" -le 0 ] && [ "$stop_stage" -ge 0 ]; then
  echo "=== stage 0: data prep"
  declare -A sexdir=( [male]=ja-JP_M [female]=ja-JP_F )
  for spk in $srcspk $trgspk; do
    root="$db_root/${sexdir[$spk]:-$spk}"
    [ -d "$root" ] || root="$db_root/$spk"  # allow pre-arranged layouts
    local/data_prep.sh "$root" "$spk" data
  done
fi

if [ "$stage" -le 1 ] && [ "$stop_stage" -ge 1 ]; then
  echo "=== stage 1: feature extraction"
  for spk in $srcspk $trgspk; do
    for set in train dev eval; do
      python3 "$repo_root/utils/split_scp.py" --n "$n_jobs" --prefix "$dumpdir/$spk/$set/split/wav" data/$spk/${set}_wav.scp
      $train_cmd JOB=1:$n_jobs "$dumpdir/$spk/$set/log/preprocess.JOB.log" \
        python3 -m seq2seq_vc_tpu.bin.preprocess \
          --wav-scp "$dumpdir/$spk/$set/split/wav.JOB.scp" \
          --dumpdir "$dumpdir/$spk/$set/raw" --config "$conf"
    done
    python3 -m seq2seq_vc_tpu.bin.compute_statistics \
      --rootdir "$dumpdir/$spk/train/raw" --config "$conf" --dumpdir "$dumpdir/$spk/stats"
    for set in train dev eval; do
      python3 -m seq2seq_vc_tpu.bin.normalize \
        --rootdir "$dumpdir/$spk/$set/raw" --dumpdir "$dumpdir/$spk/$set/norm" \
        --stats "$dumpdir/$spk/stats/stats.h5"
    done
  done
fi

if [ "$stage" -le 3 ] && [ "$stop_stage" -ge 3 ]; then
  echo "=== stage 3: training"
  python3 -m seq2seq_vc_tpu.bin.vc_train \
    --src-train-dumpdir "$dumpdir/$srcspk/train/norm" \
    --src-dev-dumpdir "$dumpdir/$srcspk/dev/norm" \
    --trg-train-dumpdir "$dumpdir/$trgspk/train/norm" \
    --trg-dev-dumpdir "$dumpdir/$trgspk/dev/norm" \
    --train-dp-input-dir "$dumpdir/$srcspk/train/norm" \
    --dev-dp-input-dir "$dumpdir/$srcspk/dev/norm" \
    --trg-stats "$dumpdir/$trgspk/stats/stats.h5" \
    --outdir "$expdir/${srcspk}_${trgspk}_${tag}" --config "$conf"
fi

if [ "$stage" -le 4 ] && [ "$stop_stage" -ge 4 ]; then
  echo "=== stage 4: decoding"
  ckpt=$(ls -dt "$expdir/${srcspk}_${trgspk}_${tag}"/checkpoint-*steps.ckpt | head -1)
  for set in dev eval; do
    python3 -m seq2seq_vc_tpu.bin.vc_decode \
      --dumpdir "$dumpdir/$srcspk/$set/norm" \
      --dp-input-dir "$dumpdir/$srcspk/$set/norm" \
      --checkpoint "$ckpt" \
      --outdir "$expdir/${srcspk}_${trgspk}_${tag}/results/$set" \
      --trg-stats "$dumpdir/$trgspk/stats/stats.h5"
  done
fi

if [ "$stage" -le 5 ] && [ "$stop_stage" -ge 5 ]; then
  echo "=== stage 5: objective evaluation"
  declare -A sexdir=( [male]=ja-JP_M [female]=ja-JP_F )
  for set in dev eval; do
    python3 -m seq2seq_vc_tpu.bin.evaluate \
      --wavdir "$expdir/${srcspk}_${trgspk}_${tag}/results/$set/wav" \
      --gt-wavdir "$db_root/${sexdir[$trgspk]:-$trgspk}/wav/$set" \
      --f0-yaml conf/f0.yaml --spk "$trgspk" \
      --fs 48000 --n-jobs "$n_jobs"
  done
fi

echo "=== hificaptain_jp vc2 recipe done"

#!/usr/bin/env bash
# CMU ARCTIC clb->slt AR VTN recipe (staged like the reference
# egs/arctic/vc1/run.sh). Requires the ARCTIC corpus downloaded under
# ${db_root}/cmu_us_<spk>_arctic with wav/*.wav files.
set -euo pipefail

stage=0
stop_stage=100
n_jobs=8
conf=conf/vtn.v1.yaml
srcspk=clb
trgspk=slt
db_root=downloads
dumpdir=dump
expdir=exp
tag=vtn.v1
num_train=932
num_dev=50
init_checkpoint=""

repo_root=$(cd "$(dirname "$0")/../../.." && pwd)
. "$repo_root/utils/parse_options.sh"

cd "$(dirname "$0")"
export PYTHONPATH="$repo_root:${PYTHONPATH:-}"
train_cmd="python3 $repo_root/utils/run_jobs.py"

if [ "$stage" -le -1 ] && [ "$stop_stage" -ge -1 ]; then
  echo "=== stage -1: download"
  for spk in $srcspk $trgspk; do
    local/data_download.sh "$db_root" "$spk"
  done
fi

if [ "$stage" -le 0 ] && [ "$stop_stage" -ge 0 ]; then
  echo "=== stage 0: data preparation"
  for spk in $srcspk $trgspk; do
    local/data_prep.sh --num_train "$num_train" --num_dev "$num_dev" \
      --num_eval 100 "$db_root/cmu_us_${spk}_arctic" "$spk" data
  done
fi

if [ "$stage" -le 1 ] && [ "$stop_stage" -ge 1 ]; then
  echo "=== stage 1: feature extraction (sharded over $n_jobs jobs)"
  for spk in $srcspk $trgspk; do
    for set in train dev eval; do
      scp=data/$spk/${set}_wav.scp
      seg_opt=()
      # pau-trimmed kaldi segments from the ARCTIC lab files, if prepared
      [ -e "data/$spk/${set}_segments" ] && seg_opt=(--segments "data/$spk/${set}_segments")
      python3 "$repo_root/utils/split_scp.py" --n "$n_jobs" --prefix "$dumpdir/$spk/$set/split/wav" "$scp"
      $train_cmd JOB=1:$n_jobs "$dumpdir/$spk/$set/log/preprocess.JOB.log" \
        python3 -m seq2seq_vc_tpu.bin.preprocess \
          --wav-scp "$dumpdir/$spk/$set/split/wav.JOB.scp" \
          --dumpdir "$dumpdir/$spk/$set/raw" --config "$conf" "${seg_opt[@]}"
    done
  done
fi

if [ "$stage" -le 2 ] && [ "$stop_stage" -ge 2 ]; then
  echo "=== stage 2: statistics + normalization"
  for spk in $srcspk $trgspk; do
    python3 -m seq2seq_vc_tpu.bin.compute_statistics \
      --rootdir "$dumpdir/$spk/train/raw" --config "$conf" \
      --dumpdir "$dumpdir/$spk/stats" --feat_type mel
    for set in train dev eval; do
      python3 -m seq2seq_vc_tpu.bin.normalize \
        --rootdir "$dumpdir/$spk/$set/raw" \
        --dumpdir "$dumpdir/$spk/$set/norm" \
        --stats "$dumpdir/$spk/stats/stats.h5" --feat_type mel
    done
  done
fi

if [ "$stage" -le 3 ] && [ "$stop_stage" -ge 3 ]; then
  echo "=== stage 3: training"
  extra=()
  [ -n "$init_checkpoint" ] && extra+=(--init-checkpoint "$init_checkpoint")
  python3 -m seq2seq_vc_tpu.bin.vc_train \
    --src-train-dumpdir "$dumpdir/$srcspk/train/norm" \
    --src-dev-dumpdir "$dumpdir/$srcspk/dev/norm" \
    --trg-train-dumpdir "$dumpdir/$trgspk/train/norm" \
    --trg-dev-dumpdir "$dumpdir/$trgspk/dev/norm" \
    --trg-stats "$dumpdir/$trgspk/stats/stats.h5" \
    --outdir "$expdir/${srcspk}_${trgspk}_${tag}" --config "$conf" "${extra[@]}"
fi

if [ "$stage" -le 4 ] && [ "$stop_stage" -ge 4 ]; then
  echo "=== stage 4: decoding"
  ckpt=$(ls -dt "$expdir/${srcspk}_${trgspk}_${tag}"/checkpoint-*steps.ckpt | head -1)
  for set in dev eval; do
    python3 -m seq2seq_vc_tpu.bin.vc_decode \
      --dumpdir "$dumpdir/$srcspk/$set/norm" \
      --checkpoint "$ckpt" \
      --outdir "$expdir/${srcspk}_${trgspk}_${tag}/results/$set" \
      --trg-stats "$dumpdir/$trgspk/stats/stats.h5"
  done
fi

if [ "$stage" -le 5 ] && [ "$stop_stage" -ge 5 ]; then
  echo "=== stage 5: objective evaluation"
  for set in dev eval; do
    python3 -m seq2seq_vc_tpu.bin.evaluate \
      --wavdir "$expdir/${srcspk}_${trgspk}_${tag}/results/$set/wav" \
      --gt-wavdir "$db_root/cmu_us_${trgspk}_arctic/wav" \
      --f0-yaml conf/f0.yaml --spk "$trgspk" --n-jobs "$n_jobs"
  done
fi

echo "=== arctic vc1 recipe done"

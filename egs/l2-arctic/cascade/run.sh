#!/usr/bin/env bash
# L2-ARCTIC foreign accent conversion — cascade approach: stage 1 converts
# the L2 speaker to the native reference speaker's voice with a
# TTS-pretrained mel VTN (removing the accent); stage 2 converts back to the
# L2 speaker's voice with an external non-parallel VC model (s3prl-vc), so
# only the accent changes. Staged like the reference
# egs/l2-arctic/cascade/run.sh.
#
# GATING: stage 6 (voice restoration) needs the external s3prl-vc model;
# pass --stage2_cmd or skip it. Stages up to 5 run with in-image code.
set -euo pipefail

stage=0
stop_stage=100
n_jobs=8
conf=conf/vtn.tts_pt.v1.yaml
arctic_db_root=../../arctic/vc1/downloads
db_root=downloads/l2arctic
dumpdir=dump
expdir=exp
tag=vtn.tts_pt.v1
srcspk=TXHC                      # L2 (accented) speaker
trgspk=bdl                       # native reference speaker
num_train=1032
stage2_cmd=""                    # external hook: cmd <wavdir> <outdir>
pretrained_model_checkpoint=downloads/ljspeech_transformer_tts_aept/checkpoint-50000steps.ckpt

repo_root=$(cd "$(dirname "$0")/../../.." && pwd)
. "$repo_root/utils/parse_options.sh"

cd "$(dirname "$0")"
export PYTHONPATH="$repo_root:${PYTHONPATH:-}"
train_cmd="python3 $repo_root/utils/run_jobs.py"

if [ "$stage" -le -1 ] && [ "$stop_stage" -ge -1 ]; then
  echo "=== stage -1: download"
  ../../arctic/vc1/local/data_download.sh "$arctic_db_root" "$trgspk"
  echo "L2-ARCTIC itself requires registration: https://psi.engr.tamu.edu/l2-arctic-corpus/"
fi

if [ "$stage" -le 0 ] && [ "$stop_stage" -ge 0 ]; then
  echo "=== stage 0: data preparation"
  ../../arctic/vc1/local/data_prep.sh --num_train "$num_train" \
    --num_dev 50 --num_eval 50 \
    "$arctic_db_root/cmu_us_${trgspk}_arctic" "$trgspk" data
  local/data_prep.sh --num_train "$num_train" \
    --num_dev 50 --num_eval 50 "$db_root/$srcspk" "$srcspk" data
fi

if [ "$stage" -le 1 ] && [ "$stop_stage" -ge 1 ]; then
  echo "=== stage 1: feature extraction"
  for spk in $srcspk $trgspk; do
    for set in train dev eval; do
      scp=data/$spk/${set}_wav.scp
      python3 "$repo_root/utils/split_scp.py" --n "$n_jobs" --prefix "$dumpdir/$spk/$set/split/wav" "$scp"
      $train_cmd JOB=1:$n_jobs "$dumpdir/$spk/$set/log/preprocess.JOB.log" \
        python3 -m seq2seq_vc_tpu.bin.preprocess \
          --wav-scp "$dumpdir/$spk/$set/split/wav.JOB.scp" \
          --dumpdir "$dumpdir/$spk/$set/raw" --config "$conf"
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
  echo "=== stage 3: VTN training (L2 -> native voice, TTS-AEPT init)"
  extra=()
  [ -e "$pretrained_model_checkpoint" ] && extra+=(--init-checkpoint "$pretrained_model_checkpoint")
  python3 -m seq2seq_vc_tpu.bin.vc_train \
    --src-train-dumpdir "$dumpdir/$srcspk/train/norm" \
    --src-dev-dumpdir "$dumpdir/$srcspk/dev/norm" \
    --trg-train-dumpdir "$dumpdir/$trgspk/train/norm" \
    --trg-dev-dumpdir "$dumpdir/$trgspk/dev/norm" \
    --trg-stats "$dumpdir/$trgspk/stats/stats.h5" \
    --outdir "$expdir/${srcspk}_${trgspk}_${tag}" --config "$conf" "${extra[@]}"
fi

if [ "$stage" -le 4 ] && [ "$stop_stage" -ge 4 ]; then
  echo "=== stage 4: stage-1 decoding (accent removal)"
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
  echo "=== stage 5: stage-1 objective evaluation"
  for set in dev eval; do
    python3 -m seq2seq_vc_tpu.bin.evaluate \
      --wavdir "$expdir/${srcspk}_${trgspk}_${tag}/results/$set/wav" \
      --gt-wavdir "$arctic_db_root/cmu_us_${trgspk}_arctic/wav" \
      --f0-yaml conf/f0.yaml --spk "$trgspk" --n-jobs "$n_jobs"
  done
fi

if [ "$stage" -le 6 ] && [ "$stop_stage" -ge 6 ]; then
  echo "=== stage 6: stage-2 decoding (voice restoration)"
  for set in dev eval; do
    in_dir="$expdir/${srcspk}_${trgspk}_${tag}/results/$set/wav"
    out_dir="$expdir/${srcspk}_${trgspk}_${tag}/results/$set/stage2_wav"
    if [ -n "$stage2_cmd" ]; then
      mkdir -p "$out_dir"
      $stage2_cmd "$in_dir" "$out_dir"
    else
      echo "GATED: stage-2 voice restoration needs the external s3prl-vc"
      echo "ppg_sxliu model; pass --stage2_cmd 'your-decoder' or run it"
      echo "on a connected machine (input wavs: $in_dir)."
      exit 1
    fi
  done
fi

if [ "$stage" -le 7 ] && [ "$stop_stage" -ge 7 ]; then
  echo "=== stage 7: stage-2 objective evaluation"
  for set in dev eval; do
    python3 -m seq2seq_vc_tpu.bin.evaluate \
      --wavdir "$expdir/${srcspk}_${trgspk}_${tag}/results/$set/stage2_wav" \
      --gt-wavdir "$arctic_db_root/cmu_us_${trgspk}_arctic/wav" \
      --f0-yaml conf/f0.yaml --spk "$trgspk" --n-jobs "$n_jobs"
  done
fi

if [ "$stage" -le 10 ] && [ "$stop_stage" -ge 10 ]; then
  echo "=== stage 10: ground-truth objective evaluation"
  python3 -m seq2seq_vc_tpu.bin.evaluate \
    --wavdir "$db_root/$srcspk/wav" \
    --gt-wavdir "$arctic_db_root/cmu_us_${trgspk}_arctic/wav" \
    --f0-yaml conf/f0.yaml --spk "$trgspk" --n-jobs "$n_jobs"
fi

echo "=== l2-arctic cascade recipe done"

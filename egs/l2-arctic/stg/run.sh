#!/usr/bin/env bash
# L2-ARCTIC foreign accent conversion — synthetic target generation (STG):
# 1) an external non-parallel VC model (s3prl-vc ppg_sxliu) re-synthesizes
#    the native speaker's utterances in the L2 speaker's voice = synthetic
#    ground truth with native accent + L2 voice;
# 2) a TTS-pretrained VTN is trained L2 -> synthetic-target on mel features.
# Staged like the reference egs/l2-arctic/stg/run.sh.
#
# GATING: stage 1 needs the external s3prl-vc model. Provide synthetic
# target wavs under data/synth_${trgspk}2${srcspk}/wav (or a --stg_cmd hook);
# every other stage is fully implemented on mel features.
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
stg_cmd=""                       # external hook: cmd <wav.scp> <outdir>
pretrained_model_checkpoint=downloads/ljspeech_transformer_tts_aept/checkpoint-50000steps.ckpt

repo_root=$(cd "$(dirname "$0")/../../.." && pwd)
. "$repo_root/utils/parse_options.sh"

cd "$(dirname "$0")"
export PYTHONPATH="$repo_root:${PYTHONPATH:-}"
train_cmd="python3 $repo_root/utils/run_jobs.py"
synth=synth_${trgspk}2${srcspk}

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
  ../cascade/local/data_prep.sh --num_train "$num_train" \
    --num_dev 50 --num_eval 50 "$db_root/$srcspk" "$srcspk" data
fi

if [ "$stage" -le 1 ] && [ "$stop_stage" -ge 1 ]; then
  echo "=== stage 1: synthetic target generation"
  if ls "data/$synth/wav"/*.wav >/dev/null 2>&1; then
    echo "data/$synth/wav already populated, skipping"
  elif [ -n "$stg_cmd" ]; then
    mkdir -p "data/$synth/wav"
    for set in train dev eval; do
      $stg_cmd "data/$trgspk/${set}_wav.scp" "data/$synth/wav"
    done
  else
    echo "GATED: synthetic target generation needs the external s3prl-vc"
    echo "ppg_sxliu model (unilight/accent-conversion-2023). Re-synthesize"
    echo "${trgspk}'s utterances in ${srcspk}'s voice into data/$synth/wav,"
    echo "or pass --stg_cmd 'your-decoder'."
    exit 1
  fi
  mkdir -p "data/$synth"
  find "$(cd "data/$synth/wav" && pwd)" -name "*.wav" | sort | awk -F/ \
    '{n=$NF; sub(/\.wav$/,"",n); print n, $0}' > "data/$synth/wav.scp"
  for set in train dev eval; do
    awk 'NR==FNR{ok[$1]=1;next} ok[$1]' "data/$trgspk/${set}_wav.scp" \
      "data/$synth/wav.scp" > "data/$synth/${set}_wav.scp"
  done
fi

if [ "$stage" -le 2 ] && [ "$stop_stage" -ge 2 ]; then
  echo "=== stage 2: feature extraction + statistics + normalization"
  for spk in $srcspk $synth; do
    for set in train dev eval; do
      scp=data/$spk/${set}_wav.scp
      python3 "$repo_root/utils/split_scp.py" --n "$n_jobs" --prefix "$dumpdir/$spk/$set/split/wav" "$scp"
      $train_cmd JOB=1:$n_jobs "$dumpdir/$spk/$set/log/preprocess.JOB.log" \
        python3 -m seq2seq_vc_tpu.bin.preprocess \
          --wav-scp "$dumpdir/$spk/$set/split/wav.JOB.scp" \
          --dumpdir "$dumpdir/$spk/$set/raw" --config "$conf"
    done
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
  echo "=== stage 3: VTN training (L2 -> synthetic target, TTS-AEPT init)"
  extra=()
  [ -e "$pretrained_model_checkpoint" ] && extra+=(--init-checkpoint "$pretrained_model_checkpoint")
  python3 -m seq2seq_vc_tpu.bin.vc_train \
    --src-train-dumpdir "$dumpdir/$srcspk/train/norm" \
    --src-dev-dumpdir "$dumpdir/$srcspk/dev/norm" \
    --trg-train-dumpdir "$dumpdir/$synth/train/norm" \
    --trg-dev-dumpdir "$dumpdir/$synth/dev/norm" \
    --trg-stats "$dumpdir/$synth/stats/stats.h5" \
    --outdir "$expdir/${srcspk}_${synth}_${tag}" --config "$conf" "${extra[@]}"
fi

if [ "$stage" -le 4 ] && [ "$stop_stage" -ge 4 ]; then
  echo "=== stage 4: decoding"
  ckpt=$(ls -dt "$expdir/${srcspk}_${synth}_${tag}"/checkpoint-*steps.ckpt | head -1)
  for set in dev eval; do
    python3 -m seq2seq_vc_tpu.bin.vc_decode \
      --dumpdir "$dumpdir/$srcspk/$set/norm" \
      --checkpoint "$ckpt" \
      --outdir "$expdir/${srcspk}_${synth}_${tag}/results/$set" \
      --trg-stats "$dumpdir/$synth/stats/stats.h5"
  done
fi

if [ "$stage" -le 6 ] && [ "$stop_stage" -ge 6 ]; then
  echo "=== stage 6: objective evaluation (vs native reference)"
  for set in dev eval; do
    python3 -m seq2seq_vc_tpu.bin.evaluate \
      --wavdir "$expdir/${srcspk}_${synth}_${tag}/results/$set/wav" \
      --gt-wavdir "$arctic_db_root/cmu_us_${trgspk}_arctic/wav" \
      --f0-yaml conf/f0.yaml --spk "$trgspk" --n-jobs "$n_jobs"
  done
fi

echo "=== l2-arctic stg recipe done"

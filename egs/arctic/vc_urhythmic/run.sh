#!/usr/bin/env bash
# Urhythmic rhythm-conversion recipe on CMU ARCTIC (mirrors the reference
# egs/arctic/vc_urhythmic/run.sh): HuBERT-soft encode -> segment -> rhythm
# model -> vocoder fine-tune -> convert. Stage 1 needs a local HuBERT-soft
# checkpoint: pass any torch HuBERT-soft/HF-HuBERT .pt via
# --hubert_checkpoint — it is converted into the NATIVE flax encoder
# (seq2seq_vc_tpu/urhythmic/hubert.py); 'hub' falls back to torch.hub.
set -euo pipefail

stage=0
stop_stage=100
srcspk=clb
trgspk=slt
db_root=../vc1/downloads
workdir=exp_urhythmic
hubert_checkpoint=hub
segmenter_checkpoint=downloads/segmenter.pkl
finetune_steps=50000

repo_root=$(cd "$(dirname "$0")/../../.." && pwd)
. "$repo_root/utils/parse_options.sh"
cd "$(dirname "$0")"
export PYTHONPATH="$repo_root:${PYTHONPATH:-}"
cli="python3 -m seq2seq_vc_tpu.urhythmic.cli"

if [ "$stage" -le 0 ] && [ "$stop_stage" -ge 0 ]; then
  echo "=== stage 0: resample to 16 kHz"
  for spk in $srcspk $trgspk; do
    $cli resample --in-dir "$db_root/cmu_us_${spk}_arctic/wav" \
      --out-dir "$workdir/$spk/wav16k" --sample-rate 16000
  done
fi

if [ "$stage" -le 1 ] && [ "$stop_stage" -ge 1 ]; then
  echo "=== stage 1: HuBERT-soft encoding"
  for spk in $srcspk $trgspk; do
    $cli encode --in-dir "$workdir/$spk/wav16k" --out-dir "$workdir/$spk/enc" \
      --hubert-checkpoint "$hubert_checkpoint"
  done
fi

if [ "$stage" -le 2 ] && [ "$stop_stage" -ge 2 ]; then
  echo "=== stage 2: segmentation"
  for spk in $srcspk $trgspk; do
    $cli segment --logprob-dir "$workdir/$spk/enc/logprobs" \
      --out-dir "$workdir/$spk/segments" \
      --segmenter-checkpoint "$segmenter_checkpoint"
  done
fi

if [ "$stage" -le 3 ] && [ "$stop_stage" -ge 3 ]; then
  echo "=== stage 3: rhythm model"
  $cli train-rhythm-model \
    --source-segments "$workdir/$srcspk/segments" \
    --target-segments "$workdir/$trgspk/segments" \
    --out-path "$workdir/rhythm_${srcspk}_${trgspk}.pkl"
fi

if [ "$stage" -le 4 ] && [ "$stop_stage" -ge 4 ]; then
  echo "=== stage 4: vocoder fine-tune on the target speaker"
  $cli fine-tune-vocoder \
    --wav-dir "$workdir/$trgspk/wav16k" --unit-dir "$workdir/$trgspk/enc/soft" \
    --checkpoint-dir "$workdir/voc_$trgspk" --steps "$finetune_steps"
fi

if [ "$stage" -le 5 ] && [ "$stop_stage" -ge 5 ]; then
  echo "=== stage 5: conversion"
  ckpt=$(ls -dt "$workdir/voc_$trgspk"/model-*.ckpt | head -1)
  $cli convert --in-dir "$workdir/$srcspk/enc" \
    --out-dir "$workdir/converted_${srcspk}_${trgspk}" \
    --segmenter-checkpoint "$segmenter_checkpoint" \
    --rhythm-model-checkpoint "$workdir/rhythm_${srcspk}_${trgspk}.pkl" \
    --vocoder-checkpoint "$ckpt"
fi

if [ "$stage" -le 6 ] && [ "$stop_stage" -ge 6 ]; then
  echo "=== stage 6: objective evaluation"
  python3 -m seq2seq_vc_tpu.bin.evaluate \
    --wavdir "$workdir/converted_${srcspk}_${trgspk}" \
    --gt-wavdir "$workdir/$trgspk/wav16k" \
    --f0-yaml conf/f0.yaml --spk "$trgspk"
fi

echo "=== urhythmic recipe done"

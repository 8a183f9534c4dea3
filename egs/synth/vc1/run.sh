#!/usr/bin/env bash
# Synthetic 2-speaker end-to-end recipe (staged, kaldi-style flags like the
# reference egs/*/run.sh). Exercises preprocess -> stats -> normalize ->
# train -> decode on a generated corpus. Usage: ./run.sh [--stage N]
set -euo pipefail

stage=0
stop_stage=100
conf=conf/aas_vc.synth.yaml
workdir=${WORKDIR:-exp_synth}
n_utts=12
repo_root=$(cd "$(dirname "$0")/../../.." && pwd)

while [ $# -gt 0 ]; do
  case "$1" in
    --stage) stage=$2; shift 2;;
    --stop_stage) stop_stage=$2; shift 2;;
    --conf) conf=$2; shift 2;;
    --workdir) workdir=$2; shift 2;;
    *) echo "unknown option $1"; exit 1;;
  esac
done

cd "$(dirname "$0")"
mkdir -p "$workdir"
export PYTHONPATH="$repo_root:${PYTHONPATH:-}"

if [ "$stage" -le 0 ] && [ "$stop_stage" -ge 0 ]; then
  echo "=== stage 0: generate synthetic corpus"
  python "$repo_root/tests/make_synth_corpus.py" --outdir "$workdir/corpus" --n-utts "$n_utts"
fi

if [ "$stage" -le 1 ] && [ "$stop_stage" -ge 1 ]; then
  echo "=== stage 1: feature extraction"
  for spk in src trg; do
    python -m seq2seq_vc_tpu.bin.preprocess \
      --wav-scp "$workdir/corpus/${spk}_wav.scp" \
      --dumpdir "$workdir/dump/${spk}/raw" --config "$conf"
  done
fi

if [ "$stage" -le 2 ] && [ "$stop_stage" -ge 2 ]; then
  echo "=== stage 2: statistics + normalization"
  for spk in src trg; do
    python -m seq2seq_vc_tpu.bin.compute_statistics \
      --rootdir "$workdir/dump/${spk}/raw" --config "$conf" \
      --dumpdir "$workdir/stats/${spk}" --feat_type mel
    python -m seq2seq_vc_tpu.bin.normalize \
      --rootdir "$workdir/dump/${spk}/raw" \
      --dumpdir "$workdir/dump/${spk}/norm" \
      --stats "$workdir/stats/${spk}/stats.h5" --feat_type mel
  done
fi

if [ "$stage" -le 3 ] && [ "$stop_stage" -ge 3 ]; then
  echo "=== stage 3: training"
  python -m seq2seq_vc_tpu.bin.vc_train \
    --src-train-dumpdir "$workdir/dump/src/norm" \
    --src-dev-dumpdir "$workdir/dump/src/norm" \
    --trg-train-dumpdir "$workdir/dump/trg/norm" \
    --trg-dev-dumpdir "$workdir/dump/trg/norm" \
    --train-dp-input-dir "$workdir/dump/src/norm" \
    --dev-dp-input-dir "$workdir/dump/src/norm" \
    --trg-stats "$workdir/stats/trg/stats.h5" \
    --outdir "$workdir/exp" --config "$conf"
fi

if [ "$stage" -le 4 ] && [ "$stop_stage" -ge 4 ]; then
  echo "=== stage 4: decoding"
  ckpt=$(ls -dt "$workdir/exp"/checkpoint-*steps.ckpt | head -1)
  python -m seq2seq_vc_tpu.bin.vc_decode \
    --dumpdir "$workdir/dump/src/norm" \
    --dp-input-dir "$workdir/dump/src/norm" \
    --checkpoint "$ckpt" \
    --outdir "$workdir/results" \
    --trg-stats "$workdir/stats/trg/stats.h5"
  echo "decoded wavs:"; ls "$workdir/results/wav" | head
fi

if [ "$stage" -le 5 ] && [ "$stop_stage" -ge 5 ]; then
  echo "=== stage 5: AR VTN training (teacher for FS2)"
  python -m seq2seq_vc_tpu.bin.vc_train \
    --src-train-dumpdir "$workdir/dump/src/norm" \
    --src-dev-dumpdir "$workdir/dump/src/norm" \
    --trg-train-dumpdir "$workdir/dump/trg/norm" \
    --trg-dev-dumpdir "$workdir/dump/trg/norm" \
    --trg-stats "$workdir/stats/trg/stats.h5" \
    --outdir "$workdir/exp_vtn" --config conf/vtn.synth.yaml
fi

if [ "$stage" -le 6 ] && [ "$stop_stage" -ge 6 ]; then
  echo "=== stage 6: teacher-forcing decode -> durations"
  ckpt=$(ls -dt "$workdir/exp_vtn"/checkpoint-*steps.ckpt | head -1)
  python -m seq2seq_vc_tpu.bin.vc_decode \
    --dumpdir "$workdir/dump/src/norm" \
    --trg-dumpdir "$workdir/dump/trg/norm" \
    --use-teacher-forcing \
    --checkpoint "$ckpt" \
    --outdir "$workdir/results_tf" \
    --trg-stats "$workdir/stats/trg/stats.h5"
  echo "durations:"; ls "$workdir/results_tf/durations" | head -3
  echo "=== stage 6b: free-running AR decode (chunked early-exit driver)"
  python -m seq2seq_vc_tpu.bin.vc_decode \
    --dumpdir "$workdir/dump/src/norm" \
    --checkpoint "$ckpt" \
    --outdir "$workdir/results_ar" \
    --batch-size 4 \
    --trg-stats "$workdir/stats/trg/stats.h5"
  echo "AR decoded wavs:"; ls "$workdir/results_ar/wav" | head -3
fi

if [ "$stage" -le 7 ] && [ "$stop_stage" -ge 7 ]; then
  echo "=== stage 7: FastSpeech-VC training on teacher durations"
  python -m seq2seq_vc_tpu.bin.vc_train \
    --src-train-dumpdir "$workdir/dump/src/norm" \
    --src-dev-dumpdir "$workdir/dump/src/norm" \
    --trg-train-dumpdir "$workdir/dump/trg/norm" \
    --trg-dev-dumpdir "$workdir/dump/trg/norm" \
    --train-duration-dir "$workdir/results_tf/durations" \
    --dev-duration-dir "$workdir/results_tf/durations" \
    --trg-stats "$workdir/stats/trg/stats.h5" \
    --outdir "$workdir/exp_fs2" --config conf/fs2.synth.yaml
fi

echo "=== synth recipe done"

#!/usr/bin/env bash
# LJSpeech Transformer-TTS pretraining + TTS-AEPT recipe (mirrors the
# reference egs/ljspeech/tts1/run.sh): tokenize -> preprocess -> train TTS
# -> decode -> AEPT second-stage (mel encoder, frozen decoder).
set -euo pipefail

stage=0
stop_stage=100
n_jobs=8
conf=conf/transformer_tts.v1.yaml
aept_conf=conf/tts_aept.v1.yaml
db_root=downloads/LJSpeech-1.1
dumpdir=dump
expdir=exp
tag=transformer_tts.v1
token_type=phn    # reference default (ref run.sh:45); falls back to the
g2p=g2p_en        # native rule-based English G2P when g2p_en is absent
cleaner=tacotron
num_dev=250

repo_root=$(cd "$(dirname "$0")/../../.." && pwd)
. "$repo_root/utils/parse_options.sh"
cd "$(dirname "$0")"
export PYTHONPATH="$repo_root:${PYTHONPATH:-}"
train_cmd="python3 $repo_root/utils/run_jobs.py"

if [ "$stage" -le -1 ] && [ "$stop_stage" -ge -1 ]; then
  echo "=== stage -1: download"
  local/data_download.sh "$(dirname "$db_root")"
fi

if [ "$stage" -le 0 ] && [ "$stop_stage" -ge 0 ]; then
  echo "=== stage 0: data prep"
  [ -f "$db_root/metadata.csv" ] || { echo "download LJSpeech-1.1 first (stage -1)"; exit 1; }
  local/data_prep.sh --num_dev "$num_dev" --num_eval 250 "$db_root" data
fi

if [ "$stage" -le 1 ] && [ "$stop_stage" -ge 1 ]; then
  echo "=== stage 1: tokenization"
  python3 -m seq2seq_vc_tpu.bin.tokenize_text \
    --input data/text --output data/tokens.txt \
    --token_type "$token_type" --g2p "$g2p" --cleaner "$cleaner" --field 2-
fi

if [ "$stage" -le 2 ] && [ "$stop_stage" -ge 2 ]; then
  echo "=== stage 2: feature extraction + stats + normalize"
  for set in train dev; do
    python3 "$repo_root/utils/split_scp.py" --n "$n_jobs" --prefix "$dumpdir/$set/split/wav" data/${set}_wav.scp
    $train_cmd JOB=1:$n_jobs "$dumpdir/$set/log/preprocess.JOB.log" \
      python3 -m seq2seq_vc_tpu.bin.preprocess \
        --wav-scp "$dumpdir/$set/split/wav.JOB.scp" \
        --dumpdir "$dumpdir/$set/raw" --config "$conf"
  done
  python3 -m seq2seq_vc_tpu.bin.compute_statistics \
    --rootdir "$dumpdir/train/raw" --config "$conf" --dumpdir "$dumpdir/stats"
  for set in train dev; do
    python3 -m seq2seq_vc_tpu.bin.normalize \
      --rootdir "$dumpdir/$set/raw" --dumpdir "$dumpdir/$set/norm" \
      --stats "$dumpdir/stats/stats.h5"
  done
fi

if [ "$stage" -le 3 ] && [ "$stop_stage" -ge 3 ]; then
  echo "=== stage 3: TTS training"
  python3 -m seq2seq_vc_tpu.bin.tts_train \
    --train-dumpdir "$dumpdir/train/norm" --dev-dumpdir "$dumpdir/dev/norm" \
    --train-text data/text --dev-text data/text \
    --token-list data/tokens.txt --token-type "$token_type" --g2p "$g2p" --cleaner "$cleaner" \
    --stats "$dumpdir/stats/stats.h5" \
    --outdir "$expdir/$tag" --config "$conf"
fi

if [ "$stage" -le 4 ] && [ "$stop_stage" -ge 4 ]; then
  echo "=== stage 4: TTS decoding (dev subset)"
  ckpt=$(ls -dt "$expdir/$tag"/checkpoint-*steps.ckpt | head -1)
  head -20 data/text > data/decode_text
  python3 -m seq2seq_vc_tpu.bin.tts_decode \
    --text data/decode_text --checkpoint "$ckpt" \
    --token-list data/tokens.txt --token-type "$token_type" --g2p "$g2p" --cleaner "$cleaner" \
    --stats "$dumpdir/stats/stats.h5" \
    --outdir "$expdir/$tag/results"
fi

if [ "$stage" -le 6 ] && [ "$stop_stage" -ge 6 ]; then
  echo "=== stage 6: TTS-AEPT (mel encoder re-training, decoder frozen)"
  ckpt=$(ls -dt "$expdir/$tag"/checkpoint-*steps.ckpt | head -1)
  python3 -m seq2seq_vc_tpu.bin.vc_train \
    --src-train-dumpdir "$dumpdir/train/norm" \
    --src-dev-dumpdir "$dumpdir/dev/norm" \
    --trg-train-dumpdir "$dumpdir/train/norm" \
    --trg-dev-dumpdir "$dumpdir/dev/norm" \
    --trg-stats "$dumpdir/stats/stats.h5" \
    --init-checkpoint "$ckpt" \
    --outdir "$expdir/tts_aept.v1" --config "$conf" \
    --additional-config "$aept_conf"
fi

echo "=== ljspeech tts1 recipe done"

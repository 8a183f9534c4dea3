#!/usr/bin/env bash
# Fetch a pretrained model bundle (TTS-AEPT seq2seq init or PWG vocoder).
# Functional match of the reference egs/arctic/vc2/local/
# pretrained_model_download.sh; uses the HuggingFace mirrors where they
# exist (the reference's Google-Drive bundles need a browser).
set -euo pipefail

if [ $# -ne 2 ]; then
  echo "Usage: $0 <download_dir> <pretrained_model>"
  echo "Available: ljspeech_transformer_tts_aept | pwg_slt | pwg_rms"
  exit 1
fi
download_dir=$1
model=$2
repo_root=$(cd "$(dirname "$0")/../../../.." && pwd)

case "$model" in
  ljspeech_transformer_tts_aept)
    repo_id="unilight/accent-conversion-2023"
    files="ljspeech_transformer_tts_aept/checkpoint-50000steps.pkl ljspeech_transformer_tts_aept/config.yml ljspeech_transformer_tts_aept/stats.h5"
    ;;
  pwg_slt|pwg_rms)
    echo "NOTE: the reference hosts $model on Google Drive"
    echo "(see /root/reference data_download); place checkpoint-400000steps.pkl,"
    echo "config.yml and stats.h5 under $download_dir/$model manually."
    exit 1
    ;;
  *) echo "unknown pretrained model: $model" >&2; exit 1 ;;
esac

mkdir -p "$download_dir"
for f in $files; do
  python3 "$repo_root/utils/hf_download.py" \
    --repo_id "$repo_id" --outdir "$download_dir" --filename "$f"
done
echo "downloaded $model into $download_dir"

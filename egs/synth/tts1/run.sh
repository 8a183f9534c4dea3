#!/usr/bin/env bash
# Synthetic Transformer-TTS smoke recipe: fake text + tone corpus ->
# tokenize -> preprocess -> tts_train -> tts_decode.
set -euo pipefail

stage=0
stop_stage=100
workdir=${WORKDIR:-exp_synth_tts}
conf=conf/tts.synth.yaml
token_type=phn   # exercises the native English G2P fallback end to end
g2p=g2p_en
repo_root=$(cd "$(dirname "$0")/../../.." && pwd)
. "$repo_root/utils/parse_options.sh"

cd "$(dirname "$0")"
mkdir -p "$workdir"
export PYTHONPATH="$repo_root:${PYTHONPATH:-}"

if [ "$stage" -le 0 ] && [ "$stop_stage" -ge 0 ]; then
  echo "=== stage 0: synthetic corpus + fake transcripts"
  python "$repo_root/tests/make_synth_corpus.py" --outdir "$workdir/corpus" --n-utts 8
  python - "$workdir" <<'PYEOF'
import sys, random
workdir = sys.argv[1]
random.seed(0)
words = "the quick brown fox jumps over a lazy dog near blue lake".split()
with open(f"{workdir}/corpus/text", "w") as f:
    for i in range(8):
        sent = " ".join(random.choices(words, k=random.randint(3, 7)))
        f.write(f"utt{i:03d} {sent}\n")
PYEOF
fi

if [ "$stage" -le 1 ] && [ "$stop_stage" -ge 1 ]; then
  echo "=== stage 1: tokenize"
  python -m seq2seq_vc_tpu.bin.tokenize_text \
    --input "$workdir/corpus/text" --output "$workdir/tokens.txt" \
    --token_type "$token_type" --g2p "$g2p" --cleaner tacotron --field 2-
fi

if [ "$stage" -le 2 ] && [ "$stop_stage" -ge 2 ]; then
  echo "=== stage 2: features + stats + normalize (src speaker as TTS voice)"
  python -m seq2seq_vc_tpu.bin.preprocess \
    --wav-scp "$workdir/corpus/src_wav.scp" \
    --dumpdir "$workdir/dump/raw" --config "$conf"
  python -m seq2seq_vc_tpu.bin.compute_statistics \
    --rootdir "$workdir/dump/raw" --config "$conf" --dumpdir "$workdir/stats"
  python -m seq2seq_vc_tpu.bin.normalize \
    --rootdir "$workdir/dump/raw" --dumpdir "$workdir/dump/norm" \
    --stats "$workdir/stats/stats.h5"
fi

if [ "$stage" -le 3 ] && [ "$stop_stage" -ge 3 ]; then
  echo "=== stage 3: TTS training"
  python -m seq2seq_vc_tpu.bin.tts_train \
    --train-dumpdir "$workdir/dump/norm" --dev-dumpdir "$workdir/dump/norm" \
    --train-text "$workdir/corpus/text" --dev-text "$workdir/corpus/text" \
    --token-list "$workdir/tokens.txt" --token-type "$token_type" --g2p "$g2p" --cleaner tacotron \
    --outdir "$workdir/exp" --config "$conf"
fi

if [ "$stage" -le 4 ] && [ "$stop_stage" -ge 4 ]; then
  echo "=== stage 4: TTS decoding"
  ckpt=$(ls -dt "$workdir/exp"/checkpoint-*steps.ckpt | head -1)
  head -3 "$workdir/corpus/text" > "$workdir/decode_text"
  python -m seq2seq_vc_tpu.bin.tts_decode \
    --text "$workdir/decode_text" --checkpoint "$ckpt" \
    --token-list "$workdir/tokens.txt" --token-type "$token_type" --g2p "$g2p" --cleaner tacotron \
    --stats "$workdir/stats/stats.h5" \
    --outdir "$workdir/results"
  ls "$workdir/results/wav"
fi

echo "=== synth tts recipe done"

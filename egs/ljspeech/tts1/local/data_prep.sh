#!/usr/bin/env bash
# Build wav.scp + text + train/dev/eval splits for LJSpeech (reference
# egs/ljspeech/tts1/local/data_prep.sh: dev/eval = 250 utts each).
set -euo pipefail
num_dev=250
num_eval=250
repo_root=$(cd "$(dirname "$0")/../../../.." && pwd)
. "$repo_root/utils/parse_options.sh"
if [ $# -ne 2 ]; then echo "Usage: $0 <db_root/LJSpeech-1.1> <data_dir>"; exit 1; fi
db_root=$1
data_dir=$2
mkdir -p "$data_dir"
find "$(cd "$db_root/wavs" && pwd)" -name "*.wav" | sort | awk -F/ \
  '{n=$NF; sub(/\.wav$/,"",n); print n, $0}' > "$data_dir/wav.scp"
# normalized transcription (3rd |-field of metadata.csv)
awk -F'|' '{print $1, $3}' "$db_root/metadata.csv" | sort > "$data_dir/text"
total=$(wc -l < "$data_dir/wav.scp")
n_train=$((total - num_dev - num_eval))
head -n "$n_train" "$data_dir/wav.scp" > "$data_dir/train_wav.scp"
tail -n +"$((n_train + 1))" "$data_dir/wav.scp" | head -n "$num_dev" > "$data_dir/dev_wav.scp"
tail -n +"$((n_train + num_dev + 1))" "$data_dir/wav.scp" > "$data_dir/eval_wav.scp"
for s in train dev eval; do
  awk 'NR==FNR{ok[$1]=1;next} ok[$1]' "$data_dir/${s}_wav.scp" "$data_dir/text" > "$data_dir/${s}_text"
done
echo "LJSpeech: $total utts -> $n_train train / $num_dev dev / $num_eval eval"

#!/usr/bin/env bash
# Build kaldi-style wav.scp + segments (pau-trimmed via the shipped .lab
# files) for one ARCTIC speaker, then split train/dev/eval.
# Functional match of the reference egs/arctic/vc1/local/data_prep.sh; the
# lab parsing runs in python (utils/parse_arctic_labs.py) instead of a bash
# while-read loop.
set -euo pipefail

num_train=932
num_dev=100
num_eval=100
train_set=train
dev_set=dev
eval_set=eval

repo_root=$(cd "$(dirname "$0")/../../../.." && pwd)
. "$repo_root/utils/parse_options.sh"

if [ $# -ne 3 ]; then
  echo "Usage: $0 [--num_train N] [--num_dev N] [--num_eval N] <db_root> <spk> <data_dir>"
  echo "e.g.: $0 downloads/cmu_us_slt_arctic slt data"
  exit 1
fi
db_root=$1
spk=$2
data_dir=$3

out=$data_dir/$spk
mkdir -p "$out"

find "$(cd "$db_root" && pwd)" -name "*.wav" | sort | awk -F/ \
  '{n=$NF; sub(/\.wav$/,"",n); print n, $0}' > "$out/wav.scp"

# segments: first/last non-pau boundary per utterance from the .lab files
if [ -d "$db_root/lab" ]; then
  python3 "$repo_root/utils/parse_arctic_labs.py" \
    --labdir "$db_root/lab" --out "$out/segments"
  # keep only utterances present in both
  awk 'NR==FNR{ok[$1]=1;next} ok[$1]' "$out/wav.scp" "$out/segments" \
    > "$out/segments.tmp" && mv "$out/segments.tmp" "$out/segments"
fi

total=$(wc -l < "$out/wav.scp")
need=$((num_train + num_dev + num_eval))
if [ "$total" -lt "$need" ]; then
  echo "only $total utts but need $need (train+dev+eval)" >&2
  exit 1
fi

head -n "$num_train" "$out/wav.scp" > "$out/${train_set}_wav.scp"
tail -n +"$((num_train + 1))" "$out/wav.scp" | head -n "$num_dev" > "$out/${dev_set}_wav.scp"
tail -n +"$((num_train + num_dev + 1))" "$out/wav.scp" | head -n "$num_eval" > "$out/${eval_set}_wav.scp"
if [ -e "$out/segments" ]; then
  for s in $train_set $dev_set $eval_set; do
    awk 'NR==FNR{ok[$1]=1;next} ok[$1]' "$out/${s}_wav.scp" "$out/segments" \
      > "$out/${s}_segments"
  done
fi
echo "$spk: $total utts -> $num_train/$num_dev/$num_eval (train/dev/eval)"

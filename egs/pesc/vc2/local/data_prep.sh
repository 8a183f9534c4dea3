#!/usr/bin/env bash
# Build wav.scp + train/dev/eval splits for one PESC speaker directory.
# Functional match of the reference egs/pesc/vc2/local/data_prep.sh
# (dev = first num_dev, eval = next num_eval, train = rest).
set -euo pipefail

num_dev=50
num_eval=150

repo_root=$(cd "$(dirname "$0")/../../../.." && pwd)
. "$repo_root/utils/parse_options.sh"

if [ $# -ne 3 ]; then
  echo "Usage: $0 [--num_dev N] [--num_eval N] <spk_wav_dir> <spk> <data_dir>"
  exit 1
fi
db_root=$1
spk=$2
data_dir=$3

out=$data_dir/$spk
mkdir -p "$out"
find "$(cd "$db_root" && pwd)" -name "*.wav" | sort | awk -F/ \
  '{n=$NF; sub(/\.wav$/,"",n); print n, $0}' > "$out/wav.scp"

total=$(wc -l < "$out/wav.scp")
head -n "$num_dev" "$out/wav.scp" > "$out/dev_wav.scp"
tail -n +"$((num_dev + 1))" "$out/wav.scp" | head -n "$num_eval" > "$out/eval_wav.scp"
tail -n +"$((num_dev + num_eval + 1))" "$out/wav.scp" > "$out/train_wav.scp"
echo "$spk: $total utts -> $(wc -l < "$out/train_wav.scp") train / $num_dev dev / $num_eval eval"

#!/usr/bin/env bash
# Build wav.scp per Hi-Fi-CAPTAIN speaker/subset. The corpus ships its own
# train/dev/eval subset directories (wav/{train_parallel,dev,eval}), so no
# count-based split is needed (reference egs/hificaptain_jp/vc2/local/data_prep.sh).
set -euo pipefail
if [ $# -ne 3 ]; then
  echo "Usage: $0 <spk_root (…/ja-JP_<sex>)> <spk> <data_dir>"
  exit 1
fi
db_root=$1
spk=$2
data_dir=$3
out=$data_dir/$spk
mkdir -p "$out"
declare -A subset=( [train]=train_parallel [dev]=dev [eval]=eval )
for set in train dev eval; do
  d=$db_root/wav/${subset[$set]}
  [ -d "$d" ] || { echo "missing $d" >&2; exit 1; }
  find "$(cd "$d" && pwd)" -name "*.wav" | sort | awk -F/ \
    '{n=$NF; sub(/\.wav$/,"",n); print n, $0}' > "$out/${set}_wav.scp"
  echo "$spk/$set: $(wc -l < "$out/${set}_wav.scp") utts"
done

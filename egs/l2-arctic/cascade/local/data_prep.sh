#!/usr/bin/env bash
# Build wav.scp + train/dev/eval splits for one L2-ARCTIC speaker
# (<db_root>/<spk>/wav/*.wav layout). Functional match of the reference
# egs/l2-arctic/cascade/local/data_prep.sh.
set -euo pipefail

num_train=1032
num_dev=50
num_eval=50

repo_root=$(cd "$(dirname "$0")/../../../.." && pwd)
. "$repo_root/utils/parse_options.sh"

if [ $# -ne 3 ]; then
  echo "Usage: $0 [--num_train N] [--num_dev N] [--num_eval N] <spk_root> <spk> <data_dir>"
  exit 1
fi
db_root=$1
spk=$2
data_dir=$3

out=$data_dir/$spk
mkdir -p "$out"
wavdir=$db_root/wav
[ -d "$wavdir" ] || wavdir=$db_root
find "$(cd "$wavdir" && pwd)" -name "*.wav" | sort | awk -F/ \
  '{n=$NF; sub(/\.wav$/,"",n); print n, $0}' > "$out/wav.scp"
total=$(wc -l < "$out/wav.scp")
head -n "$num_train" "$out/wav.scp" > "$out/train_wav.scp"
tail -n +"$((num_train + 1))" "$out/wav.scp" | head -n "$num_dev" > "$out/dev_wav.scp"
tail -n +"$((num_train + num_dev + 1))" "$out/wav.scp" | head -n "$num_eval" > "$out/eval_wav.scp"
echo "$spk: $total utts -> $num_train/$num_dev/$num_eval (train/dev/eval)"

# L2-ARCTIC ships MFA TextGrid annotations; when present, derive a kaldi
# segments file (silence trim) for bin/preprocess --segments, mirroring the
# reference data_prep's utils/parse_textgrid.py step.
tgdir=$db_root/textgrid
[ -d "$tgdir" ] || tgdir=$db_root/annotation
if [ -d "$tgdir" ]; then
  python3 "$repo_root/utils/parse_textgrid.py" \
    --textgrid_dir "$tgdir" --output "$out/segments"
fi

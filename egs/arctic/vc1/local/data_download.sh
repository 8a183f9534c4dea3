#!/usr/bin/env bash
# Fetch one CMU ARCTIC speaker into <db_root>/cmu_us_<spk>_arctic.
# Functional match of the reference egs/arctic/vc1/local/data_download.sh.
set -euo pipefail

if [ $# -ne 2 ]; then
  echo "Usage: $0 <db_root> <spk>   (spk in: slt clb bdl rms jmk awb ksp)"
  exit 1
fi
db=$1
spk=$2

case "$spk" in
  slt|clb|bdl|rms|jmk|awb|ksp) ;;
  *) echo "unknown ARCTIC speaker: $spk" >&2; exit 1 ;;
esac

marker=$db/$spk.done
if [ -e "$marker" ]; then
  echo "$spk already downloaded, skipping"
  exit 0
fi
mkdir -p "$db"
url="http://festvox.org/cmu_arctic/cmu_arctic/packed/cmu_us_${spk}_arctic-0.95-release.tar.bz2"
tarball=$db/$(basename "$url")
if command -v wget >/dev/null; then
  wget -q -O "$tarball" "$url"
else
  curl -sL -o "$tarball" "$url"
fi
tar xf "$tarball" -C "$db"
rm -f "$tarball"
touch "$marker"
echo "downloaded ARCTIC $spk into $db"

#!/usr/bin/env bash
# Fetch Hi-Fi-CAPTAIN ja-JP (female + male, 48 kHz) into <db_root>.
# Functional match of the reference egs/hificaptain_jp/vc2/local/data_download.sh.
set -euo pipefail
if [ $# -ne 1 ]; then echo "Usage: $0 <db_root>"; exit 1; fi
db=$1
marker=$db/hificaptain_jp.done
if [ -e "$marker" ]; then echo "already downloaded, skipping"; exit 0; fi
mkdir -p "$db"
for sex in F M; do
  url="https://ast-astrec.nict.go.jp/release/hi-fi-captain/hfc_ja-JP_${sex}.zip"
  zipf=$db/$(basename "$url")
  if command -v wget >/dev/null; then wget -q -O "$zipf" "$url"; else curl -sL -o "$zipf" "$url"; fi
  unzip -q "$zipf" -d "$db"
  rm -f "$zipf"
done
touch "$marker"
echo "downloaded Hi-Fi-CAPTAIN ja-JP into $db"

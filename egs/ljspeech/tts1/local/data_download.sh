#!/usr/bin/env bash
# Fetch LJSpeech-1.1 into <db_root> (reference egs/ljspeech/tts1/local/data_download.sh).
set -euo pipefail
if [ $# -ne 1 ]; then echo "Usage: $0 <db_root>"; exit 1; fi
db=$1
marker=$db/ljspeech.done
if [ -e "$marker" ]; then echo "already downloaded, skipping"; exit 0; fi
mkdir -p "$db"
url="https://data.keithito.com/data/speech/LJSpeech-1.1.tar.bz2"
tarball=$db/$(basename "$url")
if command -v wget >/dev/null; then wget -q -O "$tarball" "$url"; else curl -sL -o "$tarball" "$url"; fi
tar xf "$tarball" -C "$db"
rm -f "$tarball"
touch "$marker"
echo "downloaded LJSpeech into $db"

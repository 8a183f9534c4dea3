#!/usr/bin/env bash
# ARCTIC download is shared with ../vc1 (same corpus).
exec "$(dirname "$0")/../../vc1/local/data_download.sh" "$@"

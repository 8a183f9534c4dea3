#!/usr/bin/env bash
# ARCTIC data prep is shared with ../vc1 (same corpus/splits).
exec "$(dirname "$0")/../../vc1/local/data_prep.sh" "$@"

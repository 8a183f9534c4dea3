#!/usr/bin/env bash
# PESC (Parallel Electrolaryngeal Speech Corpus) is not publicly
# downloadable; obtain it from its distributors and place it under
# <db_root>/data/{EL,SP}/<speaker>/ (same expectation as the reference
# egs/pesc/vc2/local/data_download.sh, whose fetch lines are commented out).
set -euo pipefail

if [ $# -ne 1 ]; then
  echo "Usage: $0 <db_root>"
  exit 1
fi
db=$1
if [ -d "$db/data/EL" ] && [ -d "$db/data/SP" ]; then
  echo "PESC corpus found under $db/data"
  exit 0
fi
echo "PESC corpus not found; place it under $db/data/{EL,SP}/<speaker>/"
exit 1

#!/usr/bin/env bash
# On-chip verification queue for the round-3 late-session changes.
# Run on a QUIET host (no other python processes). Each step is serialized;
# the probe gates everything (CLAUDE.md: relay grants starve under any
# python-process contention, and a dead tunnel hangs inside jax.devices()).
#
#   ./scripts/verify_onchip.sh [workdir]
#
# Steps:
#  1. tiny timeout-bounded probe (abort early if the relay is not granting)
#  2. egs/synth/vc1 stage 6b: free-running AR decode through the new
#     ChunkedARDecoder on the real chip (uses the existing exp_verify VTN
#     checkpoint if present, else trains one via stage 5)
#  3. scripts/bench_ar_driver.py: fixed-chunk vs geometric/speculative A/B
#  4. bench.py: full headline benchmark (BENCH numbers)
set -euo pipefail
cd "$(dirname "$0")/.."

echo "=== 1. probe"
if ! timeout 300 python -c "
import time, jax, jax.numpy as jnp, numpy as np
t0=time.time(); x=jax.jit(lambda a: a*2+1)(jnp.ones((8,8)))
print('probe ok', float(np.asarray(x).sum()), f'{time.time()-t0:.1f}s')"; then
  echo "PROBE FAILED: relay not granting — do not proceed" >&2
  exit 1
fi

wd=${1:-exp_verify}
cd egs/synth/vc1
if [ ! -e "$wd"/exp_vtn/checkpoint-*steps.ckpt ]; then
  echo "=== (no VTN ckpt in $wd — running stages 0-5 first)"
  WORKDIR=$wd ./run.sh --stop_stage 5
fi
echo "=== 2. stage 6b free-running AR decode on chip"
WORKDIR=$wd ./run.sh --stage 6 --stop_stage 6
cd ../../..

echo "=== 3. AR decode driver A/B"
timeout 3000 python scripts/bench_ar_driver.py

echo "=== 4. full bench"
timeout 5400 python bench.py

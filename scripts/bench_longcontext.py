"""Long-context train-step sweep on the real chip (VERDICT r4 #2).

The flash fwd+bwd kernels and the banded rel-scores backward are justified
as "the T >= 3072 OOM-avoidance path", and the Hi-Fi-CAPTAIN 48 kHz recipe
(`egs/hificaptain_jp/vc2`, hop 512: the reference OOM'd above batch 2 on a
32 GB V100 and took 40 h / 50 k steps) is the workload that motivates it.
This sweep measures the FULL AAS-VC train step (not just attention) at
T in {2048, 3072, 4096}, batch 2, bf16, under each backend x remat, and
records ms/step + XLA's static HBM allocation plan (args/outputs/temps)
from `profile_train.py --mode train`.

Each variant runs in its OWN subprocess: the backend length gates
(S2S_FLASH_MIN_LEN) and backward selectors (S2S_REL_SCORES_BWD) are
import-time module constants, and a fresh process also keeps the jit cache
honest. OOMs are caught and reported as rows, not crashes.

Usage (on the chip, quiet host): python scripts/bench_longcontext.py
  [--shapes 2x2048,2x3072,2x4096] [--iters-cap 10] [--out JSON_PATH]

Variants per shape:
  xla          dense rel-pos attention (the (B,H,T,2T-1) band in HBM)
  fused        Pallas fused rel-scores forward, auto backward
               (S2S_FLASH_MIN_LEN pinned high so 'fused' never reroutes)
  flash        Pallas flash fwd+bwd kernels (S2S_FLASH_MIN_LEN=1)
  fused_remat  fused + jax.checkpoint over conformer layers
  flash_remat  flash + remat
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PROFILE = os.path.join(REPO, "scripts", "profile_train.py")

VARIANTS = {
    # name -> (attn, remat, env overrides)
    "xla": ("xla", False, {}),
    "fused": ("fused", False, {"S2S_FLASH_MIN_LEN": "999999"}),
    "flash": ("flash", False, {"S2S_FLASH_MIN_LEN": "1"}),
    "fused_remat": ("fused", True, {"S2S_FLASH_MIN_LEN": "999999"}),
    "flash_remat": ("flash", True, {"S2S_FLASH_MIN_LEN": "1"}),
}


def run_variant(batch, frames, name, iters, timeout_s):
    attn, remat, env_over = VARIANTS[name]
    cmd = [
        sys.executable, PROFILE, "--mode", "train", "--dtype", "bfloat16",
        "--prng", "rbg", "--batch", str(batch), "--frames", str(frames),
        "--attn", attn, "--iters", str(iters),
    ]
    if remat:
        cmd.append("--remat")
    env = dict(os.environ)
    env.update(env_over)
    t0 = time.time()
    try:
        p = subprocess.run(
            cmd, capture_output=True, text=True, env=env, timeout=timeout_s
        )
    except subprocess.TimeoutExpired:
        return {"variant": name, "batch": batch, "frames": frames,
                "error": f"timeout>{timeout_s}s"}
    wall = round(time.time() - t0, 1)
    out = p.stdout.strip().splitlines()
    row = {"variant": name, "batch": batch, "frames": frames, "wall_s": wall}
    for line in reversed(out):
        if line.startswith("{"):
            try:
                row.update(json.loads(line))
                return row
            except json.JSONDecodeError:
                pass
    blob = (p.stdout + p.stderr)[-4000:]
    low = blob.lower()
    if (
        "RESOURCE_EXHAUSTED" in blob
        or "out of memory" in low
        or "ran out of memory" in low
        # HBM allocator post-mortem table (the exception header can be
        # outside the captured tail): unmistakable OOM signature
        or "allocation type: hlo temp" in low
        or ("oom" in low and "allocat" in low)
    ):
        row["oom"] = True
        # surface the allocator's ask if present
        for ln in blob.splitlines():
            if "RESOURCE_EXHAUSTED" in ln or "allocating" in ln:
                row["oom_detail"] = ln.strip()[:300]
                break
    else:
        row["error"] = blob[-600:]
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", default="2x2048,2x3072,2x4096")
    ap.add_argument(
        "--variants", default="xla,fused,flash,fused_remat,flash_remat"
    )
    ap.add_argument("--iters-cap", type=int, default=10)
    ap.add_argument("--timeout", type=int, default=1500,
                    help="per-variant subprocess timeout (compile can be "
                    "3-9 min for flash backward over the tunnel)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    shapes = []
    for s in args.shapes.split(","):
        b, t = s.strip().split("x")
        shapes.append((int(b), int(t)))
    variants = [v.strip() for v in args.variants.split(",")]
    assert all(v in VARIANTS for v in variants), variants

    rows = []
    for batch, frames in shapes:
        # bound the timed loop: long-T steps run seconds each
        iters = max(3, min(args.iters_cap, (2 * 512 * 10) // frames))
        for name in variants:
            print(f"[longcontext] B{batch} x T{frames} {name} ...", flush=True)
            row = run_variant(batch, frames, name, iters, args.timeout)
            rows.append(row)
            print(json.dumps(row), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)
        print(f"[longcontext] wrote {args.out}")


if __name__ == "__main__":
    main()

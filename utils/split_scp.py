#!/usr/bin/env python3
"""Split an scp file into N shards — native replacement for kaldi
``split_scp.pl`` (used by recipes for n_jobs-parallel feature extraction).

Usage: split_scp.py in.scp out.1.scp out.2.scp ...
   or: split_scp.py --n 4 --prefix outdir/wav in.scp   (-> outdir/wav.1.scp ...)
"""

from __future__ import annotations

import argparse
import os
import sys


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=None)
    parser.add_argument("--prefix", default=None)
    parser.add_argument("scp")
    parser.add_argument("outputs", nargs="*")
    args = parser.parse_args()

    with open(args.scp) as f:
        lines = [line for line in f if line.strip()]

    if args.n:
        outputs = [f"{args.prefix or args.scp}.{i + 1}.scp" for i in range(args.n)]
    else:
        outputs = args.outputs
    if not outputs:
        print("no outputs specified", file=sys.stderr)
        sys.exit(1)

    n = len(outputs)
    base, extra = divmod(len(lines), n)
    start = 0
    for i, out in enumerate(outputs):
        size = base + (1 if i < extra else 0)
        os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
        with open(out, "w") as f:
            f.writelines(lines[start : start + size])
        start += size


if __name__ == "__main__":
    main()

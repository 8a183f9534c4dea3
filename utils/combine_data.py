#!/usr/bin/env python3
"""Combine kaldi-style data dirs — native replacement for ``combine_data.sh``.

Usage: combine_data.py <dst_data_dir> <src1> <src2> ...
Concatenates matching scp/text files, sorts by utt id, checks duplicates.
"""

from __future__ import annotations

import argparse
import os
import sys


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("dst")
    parser.add_argument("srcs", nargs="+")
    args = parser.parse_args()

    os.makedirs(args.dst, exist_ok=True)
    names = set()
    for src in args.srcs:
        names.update(
            f for f in os.listdir(src)
            if f.endswith(".scp") or f in ("text", "utt2spk", "segments")
        )
    for name in sorted(names):
        merged = {}
        for src in args.srcs:
            path = os.path.join(src, name)
            if not os.path.exists(path):
                continue
            with open(path) as f:
                for line in f:
                    if not line.strip():
                        continue
                    utt = line.split()[0]
                    if utt in merged and merged[utt] != line:
                        print(f"duplicate utt id {utt} in {name}", file=sys.stderr)
                        sys.exit(1)
                    merged[utt] = line
        with open(os.path.join(args.dst, name), "w") as out:
            for utt in sorted(merged):
                out.write(merged[utt])
    print(f"combined {len(args.srcs)} dirs -> {args.dst}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Make a subset of a kaldi-style data dir — native replacement for
``make_subset_data.sh`` / ``subset_data_dir.sh``.

Usage: subset_data.py <src_data_dir> <num_utts|--utt-list file> <dst_data_dir>
Supports --first/--last/--shuffle selection over wav.scp (and copies any
other per-utt scp files consistently).
"""

from __future__ import annotations

import argparse
import os
import random


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("src")
    parser.add_argument("dst")
    parser.add_argument("--num-utts", type=int, default=None)
    parser.add_argument("--utt-list", default=None)
    parser.add_argument("--mode", choices=["first", "last", "shuffle"], default="first")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    wav_scp = os.path.join(args.src, "wav.scp")
    with open(wav_scp) as f:
        lines = [line for line in f if line.strip()]
    utts = [line.split()[0] for line in lines]

    if args.utt_list:
        with open(args.utt_list) as f:
            keep = {line.split()[0] for line in f if line.strip()}
    else:
        n = args.num_utts or len(utts)
        order = list(range(len(utts)))
        if args.mode == "shuffle":
            random.Random(args.seed).shuffle(order)
        elif args.mode == "last":
            order = order[::-1]
        keep = {utts[i] for i in order[:n]}

    os.makedirs(args.dst, exist_ok=True)
    for fname in os.listdir(args.src):
        path = os.path.join(args.src, fname)
        if not os.path.isfile(path) or not (
            fname.endswith(".scp") or fname in ("text", "utt2spk", "segments")
        ):
            continue
        with open(path) as f, open(os.path.join(args.dst, fname), "w") as out:
            for line in f:
                if line.split() and line.split()[0] in keep:
                    out.write(line)
    print(f"subset {len(keep)} utts -> {args.dst}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Build a kaldi segments file from CMU ARCTIC .lab files.

Each lab line is "<end_time> <score> <phone>"; the utterance's speech span
is from the end of the leading pau run to the start of the trailing pau run
(same boundaries the reference's egs/arctic/vc1/local/data_prep.sh extracts
with a bash while-read loop).
"""

import argparse
import glob
import os


def speech_span(lab_path):
    entries = []
    with open(lab_path) as f:
        for line in f:
            parts = line.split()
            if len(parts) != 3:
                continue  # header '#' line
            t, _, phone = parts
            entries.append((float(t), phone))
    if not entries:
        return None
    start = 0.0
    for t, phone in entries:
        if phone != "pau":
            break
        start = t
    end = entries[-1][0]
    for t, phone in reversed(entries):
        if phone != "pau":
            break
        end = t
    if end <= start:
        return None
    return start, end


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--labdir", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    lines = []
    for lab in sorted(glob.glob(os.path.join(args.labdir, "*.lab"))):
        utt = os.path.splitext(os.path.basename(lab))[0]
        span = speech_span(lab)
        if span is None:
            continue
        lines.append(f"{utt} {utt} {span[0]:.4f} {span[1]:.4f}")
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {len(lines)} segments to {args.out}")


if __name__ == "__main__":
    main()

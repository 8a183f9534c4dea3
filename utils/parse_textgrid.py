#!/usr/bin/env python3
"""Build a kaldi ``segments`` file from Praat/MFA TextGrid annotations.

Functional match of the reference ``utils/parse_textgrid.py`` (which uses
the external ``textgrid`` package, absent from this image): for every
*.TextGrid under --textgrid_dir, take the FIRST tier, find the first and
last non-empty interval marks, and emit

    <utt> <utt> <start_time> <end_time>

one line per file — i.e. trim leading/trailing silence for
``bin/preprocess.py --segments``. The parser below handles Praat "long"
TextGrid files (what MFA writes) without external dependencies.
"""

from __future__ import annotations

import argparse
import glob
import os
import re
import sys

_INTERVAL_RE = re.compile(
    r"intervals\s*\[\d+\]\s*:?\s*"
    r"xmin\s*=\s*([-\d.eE+]+)\s*"
    r"xmax\s*=\s*([-\d.eE+]+)\s*"
    r'text\s*=\s*"((?:[^"]|"")*)"',
)
_TIER_SPLIT_RE = re.compile(r"item\s*\[\d+\]\s*:")


def parse_textgrid_intervals(path: str):
    """(xmin, xmax, text) triples of the first interval tier."""
    with open(path, encoding="utf-8", errors="replace") as f:
        content = f.read()
    tiers = _TIER_SPLIT_RE.split(content)
    if len(tiers) < 2:
        raise ValueError(
            f"{path}: no 'item [n]:' tier found — only Praat long-format "
            "TextGrid files are supported"
        )
    out = []
    for tier in tiers[1:]:
        out = [
            (float(m.group(1)), float(m.group(2)), m.group(3).replace('""', '"'))
            for m in _INTERVAL_RE.finditer(tier)
        ]
        if out:
            break
    if not out:
        raise ValueError(f"{path}: no intervals parsed from the first tier")
    return out


def voiced_span(intervals):
    """(start, end) of the first..last non-empty-mark interval."""
    marked = [(a, b) for a, b, text in intervals if text.strip()]
    if not marked:
        raise ValueError("all interval marks are empty")
    return marked[0][0], marked[-1][1]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--textgrid_dir", required=True)
    ap.add_argument("--output", required=True)
    args = ap.parse_args()

    files = sorted(
        glob.glob(os.path.join(args.textgrid_dir, "**", "*.TextGrid"),
                  recursive=True)
    )
    if not files:
        sys.exit(f"no *.TextGrid files under {args.textgrid_dir}")
    n_bad = 0
    with open(args.output, "w") as outf:
        for f in files:
            utt = os.path.splitext(os.path.basename(f))[0]
            try:
                start, end = voiced_span(parse_textgrid_intervals(f))
            except ValueError as e:
                print(f"skipping {utt}: {e}", file=sys.stderr)
                n_bad += 1
                continue
            outf.write(f"{utt} {utt} {start} {end}\n")
    print(f"wrote {len(files) - n_bad} segments to {args.output}"
          + (f" ({n_bad} skipped)" if n_bad else ""))


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Download a HuggingFace checkpoint (reference ``utils/hf_download.py``).

This image has no network egress; the tool exists for API parity and works
when run in a connected environment.

Usage: hf_download.py --repo_id <org/name> --outdir <dir> [--filename f]
"""

from __future__ import annotations

import argparse
import sys


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--repo_id", required=True)
    parser.add_argument("--outdir", required=True)
    parser.add_argument("--filename", default=None)
    args = parser.parse_args()
    try:
        from huggingface_hub import hf_hub_download, snapshot_download
    except ImportError:
        print("huggingface_hub is not installed in this image", file=sys.stderr)
        sys.exit(1)
    try:
        if args.filename:
            path = hf_hub_download(
                repo_id=args.repo_id, filename=args.filename, local_dir=args.outdir
            )
        else:
            path = snapshot_download(repo_id=args.repo_id, local_dir=args.outdir)
        print(path)
    except Exception as e:
        print(f"download failed (no network egress in this image?): {e}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()

"""Normalize dumped features with precomputed statistics.

Capability match with reference ``bin/normalize.py:27-225``: z-normalizes
each utterance's features with stats.h5 and writes normalized HDF5 dumps
(plus the raw wave copy when present).
"""

from __future__ import annotations

import argparse
import logging
import os

from tqdm import tqdm

from ..dsp.stats import normalize
from ..train.data import _make_loader
from ..utils.io import read_hdf5, write_hdf5


def main():
    from ..core.cache import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser(description="Normalize dumped features")
    parser.add_argument("--rootdir", default=None)
    parser.add_argument("--feats-scp", "--scp", default=None)
    parser.add_argument("--dumpdir", required=True)
    parser.add_argument("--stats", required=True)
    parser.add_argument("--feat_type", default="mel")
    parser.add_argument("--skip-wav-copy", action="store_true")
    parser.add_argument("--verbose", type=int, default=1)
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO if args.verbose else logging.WARNING)
    src = args.feats_scp or args.rootdir
    if src is None:
        raise ValueError("either --feats-scp or --rootdir is required")
    loader = _make_loader(src, args.feat_type)

    mean = read_hdf5(args.stats, f"{args.feat_type}_mean")
    scale = read_hdf5(args.stats, f"{args.feat_type}_scale")

    os.makedirs(args.dumpdir, exist_ok=True)
    for utt in tqdm(list(loader.keys())):
        feat = normalize(loader[utt], mean, scale).astype("float32")
        out = os.path.join(args.dumpdir, f"{utt}.h5")
        write_hdf5(out, args.feat_type, feat)
        if not args.skip_wav_copy and hasattr(loader, "mapping"):
            try:
                wave = read_hdf5(loader.mapping[utt], "wave")
                write_hdf5(out, "wave", wave)
            except KeyError:
                pass


if __name__ == "__main__":
    main()

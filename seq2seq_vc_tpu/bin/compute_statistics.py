"""Compute per-feature mean/scale statistics over a dump directory.

Capability match with reference ``bin/compute_statistics.py:25-155``
(sklearn StandardScaler.partial_fit semantics) using the shard-mergeable
Welford accumulator (``dsp/stats.py``); writes ``<feat>_mean`` /
``<feat>_scale`` datasets into stats.h5.
"""

from __future__ import annotations

import argparse
import logging

from tqdm import tqdm

from ..core.config import load_config
from ..dsp.stats import RunningStats
from ..train.data import _make_loader
from ..utils.io import write_hdf5


def main():
    from ..core.cache import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser(description="Compute feature statistics")
    parser.add_argument("--feats-scp", "--scp", default=None)
    parser.add_argument("--rootdir", default=None)
    parser.add_argument("--config", required=True)
    parser.add_argument("--dumpdir", required=True, help="output stats.h5 path or dir")
    parser.add_argument("--feat_type", default="mel")
    parser.add_argument("--verbose", type=int, default=1)
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO if args.verbose else logging.WARNING)
    load_config(args.config)  # validated for parity; stats need no params

    src = args.feats_scp or args.rootdir
    if src is None:
        raise ValueError("either --feats-scp or --rootdir is required")
    loader = _make_loader(src, args.feat_type)

    stats = RunningStats()
    for utt in tqdm(list(loader.keys())):
        stats.update(loader[utt])

    out = args.dumpdir
    if not out.endswith(".h5"):
        import os

        os.makedirs(out, exist_ok=True)
        out = os.path.join(out, "stats.h5")
    write_hdf5(out, f"{args.feat_type}_mean", stats.mean.astype("float32"))
    write_hdf5(out, f"{args.feat_type}_scale", stats.scale.astype("float32"))
    logging.info("wrote stats to %s", out)


if __name__ == "__main__":
    main()

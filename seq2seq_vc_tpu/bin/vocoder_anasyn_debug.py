"""Vocoder analysis-synthesis sanity check (reference
``bin/vocoder_anasyn_debug.py``): extract ground-truth features from wavs
and immediately re-synthesize them, isolating the vocoder from the VC
model."""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np
from tqdm import tqdm

from ..core.config import load_config
from ..dsp.features import LogMelExtractor
from ..dsp.stats import normalize
from ..utils.audio import read_wav, write_wav
from ..utils.io import find_files, get_basename, read_hdf5, read_scp
from ..vocoder import get_vocoder


def main():
    from ..core.cache import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser(description="Vocoder analysis-synthesis debug")
    parser.add_argument("--wav-scp", default=None)
    parser.add_argument("--rootdir", default=None, help="wav dir alternative")
    parser.add_argument("--config", required=True)
    parser.add_argument("--outdir", required=True)
    parser.add_argument("--stats", default=None, help="normalize feats before vocoding")
    parser.add_argument("--feat-type", default="mel")
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO)
    config = load_config(args.config)
    sr = config["sampling_rate"]
    extractor = LogMelExtractor(
        sampling_rate=sr,
        fft_size=config["fft_size"],
        hop_size=config["hop_size"],
        win_length=config.get("win_length"),
        num_mels=config["num_mels"],
        fmin=config.get("fmin"),
        fmax=config.get("fmax"),
    )
    stats = None
    if args.stats:
        stats = {
            "mean": read_hdf5(args.stats, f"{args.feat_type}_mean"),
            "scale": read_hdf5(args.stats, f"{args.feat_type}_scale"),
        }
    vocoder = get_vocoder(config, trg_stats=stats)

    if args.wav_scp:
        items = read_scp(args.wav_scp).items()
    else:
        items = [(get_basename(p), p) for p in sorted(find_files(args.rootdir, "*.wav"))]

    os.makedirs(args.outdir, exist_ok=True)
    for utt, path in tqdm(list(items)):
        audio, in_sr = read_wav(path)
        assert in_sr == sr, f"{utt}: expected {sr} Hz, got {in_sr}"
        mel = extractor(audio)
        if stats is not None:
            mel = normalize(mel, stats["mean"], stats["scale"])
        y = vocoder.decode(np.asarray(mel))
        write_wav(os.path.join(args.outdir, f"{utt}.wav"), y, sr)


if __name__ == "__main__":
    main()

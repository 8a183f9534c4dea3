#!/usr/bin/env python3
"""Fixtures for the synthetic urhythmic end-to-end smoke run.

Creates everything the recipe's gated inputs would normally come from
outside the image, so all six urhythmic stages run unmodified:

* two tiny 16 kHz "speakers" (harmonic tones at different F0 with silence
  edges and amplitude modulation),
* a randomly initialized torch HuBERT(-soft) checkpoint in the exact
  format ``urhythmic.cli encode`` converts (transformers HubertModel state
  dict + proj/label_embedding soft head — see tests/test_hubert.py),
* a Segmenter checkpoint: agglomerative clustering fit on the same random
  label-embedding codebook, with an arbitrary sound-type assignment.

The weights are random — outputs are not speech — but every stage's real
code path (encode conversion, DP segmentation, gamma rhythm fit, GAN
fine-tune, stretch + vocode) executes end to end.
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np

repo_root = os.path.abspath(os.path.join(os.path.dirname(__file__), "../../../.."))
sys.path.insert(0, repo_root)


def make_wavs(out_dir: str, f0: float, n_utts: int, seed: int):
    from seq2seq_vc_tpu.utils.audio import write_wav

    os.makedirs(out_dir, exist_ok=True)
    sr = 16000
    rng = np.random.default_rng(seed)
    for i in range(n_utts):
        dur = 1.0 + 0.4 * rng.random()
        t = np.arange(int(sr * dur)) / sr
        phase = 2 * np.pi * f0 * (1.0 + 0.02 * np.sin(2 * np.pi * 3 * t)) * t
        x = sum(0.5 ** k * np.sin((k + 1) * phase) for k in range(4))
        # amplitude envelope with silence edges and a mid gap
        env = np.minimum(1.0, 20 * t) * np.minimum(1.0, 20 * (t[-1] - t))
        gap_c = 0.4 + 0.3 * rng.random()
        env *= 1.0 - 0.95 * np.exp(-(((t - gap_c) / 0.03) ** 2))
        x = 0.3 * x * env + 0.002 * rng.standard_normal(t.size)
        write_wav(os.path.join(out_dir, f"utt{i:03d}.wav"),
                  x.astype(np.float32), sr)


def make_hubert_ckpt(path: str):
    import torch
    from transformers import HubertConfig, HubertModel

    torch.manual_seed(0)
    sd = HubertModel(HubertConfig()).state_dict()
    g = torch.Generator().manual_seed(1)
    sd["proj.weight"] = 0.02 * torch.randn(256, 768, generator=g)
    sd["proj.bias"] = torch.zeros(256)
    sd["label_embedding.weight"] = torch.randn(100, 256, generator=g)
    torch.save(sd, path)
    return np.asarray(sd["label_embedding.weight"])


def make_segmenter_ckpt(path: str, codebook: np.ndarray):
    from seq2seq_vc_tpu.urhythmic.segmenter import Segmenter
    from seq2seq_vc_tpu.urhythmic.utils import OBSTRUENT, SILENCE, SONORANT

    seg = Segmenter(num_clusters=3, gamma=2)
    seg.cluster(codebook)
    # random weights carry no phonetics; assign sound types arbitrarily —
    # the rhythm/stretch code paths only need a consistent labeling
    seg.sound_types = {0: SILENCE, 1: SONORANT, 2: OBSTRUENT}
    with open(path, "wb") as f:
        pickle.dump(seg.state_dict(), f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--n-utts", type=int, default=6)
    args = ap.parse_args()

    make_wavs(os.path.join(args.workdir, "src", "wav16k"), 110.0,
              args.n_utts, 0)
    make_wavs(os.path.join(args.workdir, "trg", "wav16k"), 220.0,
              args.n_utts, 1)
    os.makedirs(os.path.join(args.workdir, "downloads"), exist_ok=True)
    codebook = make_hubert_ckpt(
        os.path.join(args.workdir, "downloads", "hubert_soft_random.pt"))
    make_segmenter_ckpt(
        os.path.join(args.workdir, "downloads", "segmenter.pkl"), codebook)
    print("fixtures ready under", args.workdir)


if __name__ == "__main__":
    main()

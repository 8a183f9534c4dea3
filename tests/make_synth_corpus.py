"""Generate a tiny synthetic parallel 2-speaker corpus for e2e tests.

Creates wav files for a 'src' and 'trg' pseudo-speaker saying the same
"utterances" (same harmonic skeleton, different f0/formant scaling and
duration), plus kaldi-style wav.scp files. Used by the e2e pipeline test
and the synth recipe (egs/synth/vc1).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from seq2seq_vc_tpu.utils.audio import write_wav  # noqa: E402


def synth_utt(rng, sr: int, seconds: float, f0: float, formant_scale: float):
    """A harmonic tone with slow random f0 contour + noise floor."""
    n = int(sr * seconds)
    t = np.arange(n) / sr
    contour = 1.0 + 0.1 * np.sin(2 * np.pi * rng.uniform(0.5, 2.0) * t + rng.uniform(0, 6))
    phase = 2 * np.pi * np.cumsum(f0 * contour) / sr
    y = np.zeros(n)
    for k, amp in enumerate([1.0, 0.5, 0.3, 0.2], start=1):
        y += amp * formant_scale ** (k - 1) * np.sin(k * phase)
    env = np.minimum(1.0, np.minimum(t / 0.05, (seconds - t) / 0.05))
    y = y * env * 0.3 + 0.005 * rng.standard_normal(n)
    return y.astype(np.float32)


def make_corpus(outdir: str, n_utts: int = 12, sr: int = 16000, seed: int = 0):
    rng = np.random.default_rng(seed)
    scps = {}
    for spk, f0, fs_scale, dur_scale in [
        ("src", 140.0, 0.9, 1.0),
        ("trg", 220.0, 0.7, 1.15),
    ]:
        wav_dir = os.path.join(outdir, spk)
        os.makedirs(wav_dir, exist_ok=True)
        lines = []
        for i in range(n_utts):
            utt_rng = np.random.default_rng(1000 + i)
            seconds = utt_rng.uniform(0.8, 1.6) * dur_scale
            y = synth_utt(utt_rng, sr, seconds, f0 * utt_rng.uniform(0.95, 1.05), fs_scale)
            path = os.path.join(wav_dir, f"utt{i:03d}.wav")
            write_wav(path, y, sr)
            lines.append(f"utt{i:03d} {path}")
        scp = os.path.join(outdir, f"{spk}_wav.scp")
        with open(scp, "w") as f:
            f.write("\n".join(lines) + "\n")
        scps[spk] = scp
    return scps


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--outdir", required=True)
    parser.add_argument("--n-utts", type=int, default=12)
    parser.add_argument("--sr", type=int, default=16000)
    args = parser.parse_args()
    make_corpus(args.outdir, args.n_utts, args.sr)
    print(f"wrote synthetic corpus to {args.outdir}")

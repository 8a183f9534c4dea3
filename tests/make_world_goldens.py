"""Generate the WORLD-chain golden fixtures (tests/fixtures/world_chain_goldens.npz).

Pins the native Harvest + CheapTrick + mcep + DTW metric chain
(``seq2seq_vc_tpu/evaluate``) against regression: deterministic synthetic
signals run through ``world_extract`` and ``calculate_mcd_f0``, outputs
committed. Re-run this script ONLY when the chain is deliberately changed,
and say why in the commit.

On a machine with pyworld/pysptk installed the same script doubles as the
cross-validation harness: ``world_extract`` auto-switches to those packages
when importable, so regenerating there yields the reference-chain numbers
(unavailable in this image — no egress; documented gap, VERDICT r2 #7).
"""

import os

import numpy as np

from seq2seq_vc_tpu.evaluate.dtw_based import calculate_mcd_f0
from seq2seq_vc_tpu.evaluate.signal import world_extract

FS = 16000


def harmonic(f0_track, fs=FS, n_harm=8, decay=0.7):
    phase = 2 * np.pi * np.cumsum(f0_track) / fs
    x = sum((decay ** k) * np.sin((k + 1) * phase) for k in range(n_harm))
    return (x / np.abs(x).max()).astype(np.float64)


def signals():
    t = np.arange(FS) / FS
    vib = 200 + 15 * np.sin(2 * np.pi * 5 * t)
    a = harmonic(vib)
    b = harmonic(vib + 10.0, decay=0.6)  # +10 Hz f0, different tilt
    chirp = harmonic(np.linspace(120, 260, FS))
    return {"vib": a, "vib_shifted": b, "chirp": chirp}


def main(out_path):
    sigs = signals()
    data = {}
    for name, x in sigs.items():
        feats = world_extract(x, FS, f0min=70, f0max=400)
        data[f"{name}_f0"] = feats["f0"].astype(np.float32)
        data[f"{name}_mcep_mean"] = feats["mcep"].mean(axis=0).astype(np.float32)
        data[f"{name}_mcep_std"] = feats["mcep"].std(axis=0).astype(np.float32)
        data[f"{name}_npow"] = feats["npow"].astype(np.float32)
    m = calculate_mcd_f0(sigs["vib"], sigs["vib_shifted"], FS, 70, 400, True)
    for k, v in m.items():
        data[f"pair_{k}"] = np.float32(v)
    np.savez(out_path, **data)
    print(f"wrote {out_path}:")
    for k in sorted(data):
        v = data[k]
        print(f"  {k}: {v if v.ndim == 0 else v.shape}")


if __name__ == "__main__":
    here = os.path.dirname(os.path.abspath(__file__))
    os.makedirs(os.path.join(here, "fixtures"), exist_ok=True)
    main(os.path.join(here, "fixtures", "world_chain_goldens.npz"))

"""Urhythmic conversion systems (reference ``urhythmic/model.py``):
segmentation -> rhythm transform -> time stretch -> HiFi-GAN synthesis.

The HuBERT-soft content encoder is external (torch hub download in the
reference — no network egress here); ``encode`` accepts any encoder with
``units``/``logits`` callables and is gated with a clear error otherwise.
The vocoder is the JAX HiFi-GAN generator (``vocoder/hifigan.py``).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .rhythm_model import RhythmModelFineGrained, RhythmModelGlobal
from .segmenter import Segmenter
from .stretcher import TimeStretcherFineGrained, TimeStretcherGlobal


def encode(hubert: Any, wav: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """wav -> (soft units (N, D), log_probs (N, K)) via a HuBERT-soft model.

    Args:
        hubert: either the native flax encoder as a ``(HubertSoft, params)``
            tuple (``urhythmic.hubert.load_hubert_soft``), or a torch object
            with ``units(wav)`` / ``logits(units)`` (e.g. bshall/hubert via
            torch hub). Raises if None.
    """
    if hubert is None:
        raise RuntimeError(
            "a HuBERT-soft encoder is required: pass a checkpoint for the "
            "native flax implementation (urhythmic/hubert.py) or a torch "
            "module"
        )
    if isinstance(hubert, tuple):  # native flax path
        from .hubert import encode_batch

        model, params = hubert
        units, log_probs, n_frames = encode_batch(model, params, np.asarray(wav))
        n = int(n_frames[0])
        return np.asarray(units[0, :n]), np.asarray(log_probs[0, :n])
    import torch
    import torch.nn.functional as F

    with torch.inference_mode():
        t = torch.as_tensor(np.asarray(wav), dtype=torch.float32).reshape(1, 1, -1)
        units = hubert.units(t)
        logits = hubert.logits(units)
        log_probs = F.log_softmax(logits, dim=-1)
    return units[0].cpu().numpy(), log_probs[0].cpu().numpy()


class _UrhythmicBase:
    def __init__(self, segmenter: Segmenter, rhythm_model, time_stretcher, vocoder_fn):
        """vocoder_fn: callable (T, D) units -> (N,) waveform (see
        ``vocoder.hifigan.load_hifigan_backend``)."""
        self.segmenter = segmenter
        self.rhythm_model = rhythm_model
        self.time_stretcher = time_stretcher
        self.vocoder_fn = vocoder_fn


class UrhythmicFine(_UrhythmicBase):
    """Fine-grained voice + rhythm conversion."""

    def __call__(self, units: np.ndarray, log_probs: np.ndarray) -> np.ndarray:
        """units: (N, D); log_probs: (N, K). Returns waveform (T,)."""
        clusters, boundaries = self.segmenter(log_probs)
        tgt_durations = self.rhythm_model(clusters, boundaries)
        stretched = self.time_stretcher(units, clusters, boundaries, tgt_durations)
        return np.asarray(self.vocoder_fn(stretched))


class UrhythmicGlobal(_UrhythmicBase):
    """Global speaking-rate conversion."""

    def __call__(self, units: np.ndarray, log_probs: np.ndarray) -> np.ndarray:
        ratio = self.rhythm_model()
        stretched = self.time_stretcher(units, ratio)
        return np.asarray(self.vocoder_fn(stretched))

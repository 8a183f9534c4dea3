"""Two-stage latent -> wav vocoding (reference ``vocoder/s3prl_feat2wav.py:76``).

Stage 1 maps upstream latents (e.g. s3prl PPGs) to mel with a downstream
model; stage 2 vocodes the mel with the inner vocoder. Semantics follow the
reference ``decode`` (``s3prl_feat2wav.py:143-156``): incoming latents are
DEnormalized with the VC model's target stats, the downstream returns mel
in the vocoder's domain, and the inner vocoder runs without re-norm.

The reference builds stage 1 from external s3prl-vc checkpoints; here the
Taco2-AR downstream is ported natively (``vocoder/taco2ar.py``) and
``from_checkpoint`` converts a torch checkpoint into it. A custom callable
can still be injected for other downstream types.
"""

from __future__ import annotations

import logging
import time
from typing import Any, Callable, Dict, Optional

import numpy as np

from ..dsp.stats import denormalize, normalize
from .vocoder import Vocoder


class S3PRL_Feat2Wav:
    def __init__(
        self,
        downstream: Callable[[np.ndarray], np.ndarray],
        inner_vocoder: Vocoder,
        trg_stats: Optional[Dict[str, np.ndarray]] = None,
    ):
        """Args:
            downstream: (T, latent_dim) -> (T', n_mels) model (e.g. the
                native Taco2-AR port with converted s3prl-vc weights).
            inner_vocoder: mel -> wav vocoder (HiFi-GAN / Griffin-Lim).
            trg_stats: {'mean','scale'} of the VC model's target latents;
                incoming (normalized) latents are denormalized by these
                before stage 1 (reference ``s3prl_feat2wav.py:143-146``).
        """
        self.downstream = downstream
        self.inner = inner_vocoder
        self.trg_stats = trg_stats

    @classmethod
    def from_checkpoint(
        cls,
        checkpoint: str,
        config: Dict[str, Any],
        stats: Dict[str, np.ndarray],
        trg_stats: Dict[str, np.ndarray],
        inner_vocoder: Vocoder,
    ) -> "S3PRL_Feat2Wav":
        """Reference-constructor equivalent (``s3prl_feat2wav.py:15-80``):
        torch downstream checkpoint + downstream config + downstream mel
        stats + VC target stats."""
        from .taco2ar import build_downstream

        downstream = build_downstream(
            checkpoint, config, np.asarray(stats["mean"]), np.asarray(stats["scale"])
        )
        return cls(downstream, inner_vocoder, trg_stats=trg_stats)

    @property
    def fs(self) -> int:
        return self.inner.fs

    def decode(self, latents: np.ndarray) -> np.ndarray:
        start = time.time()
        if self.trg_stats is not None:
            latents = denormalize(
                latents, self.trg_stats["mean"], self.trg_stats["scale"]
            )
        mel = np.asarray(self.downstream(latents))
        y = self.inner.decode(mel)
        rtf = (time.time() - start) / (len(y) / self.fs)
        logging.info("feat2wav total RTF = %.06f", rtf)
        return y

"""Two-stage latent -> wav vocoding (reference ``vocoder/s3prl_feat2wav.py:76``).

Stage 1 maps upstream latents (e.g. s3prl PPGs) to mel with a downstream
model; stage 2 vocodes the mel with the inner vocoder. The reference builds
stage 1 from s3prl-vc checkpoints — external downloads unavailable in this
image — so the downstream model is injected as a callable; everything else
(stat chains, RTF logging, decode API) is implemented.
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
        stats: Optional[Dict[str, np.ndarray]] = None,
    ):
        """Args:
            downstream: (T, latent_dim) -> (T', n_mels) model (e.g. a
                converted s3prl-vc downstream network).
            inner_vocoder: mel -> wav vocoder (HiFi-GAN / Griffin-Lim).
            stats: {'mean','scale'} the downstream was trained with; the
                incoming latents are normalized by these before stage 1.
        """
        self.downstream = downstream
        self.inner = inner_vocoder
        self.stats = stats

    @property
    def fs(self) -> int:
        return self.inner.fs

    def decode(self, latents: np.ndarray) -> np.ndarray:
        start = time.time()
        if self.stats is not None:
            latents = normalize(latents, self.stats["mean"], self.stats["scale"])
        mel = np.asarray(self.downstream(latents))
        y = self.inner.decode(mel)
        rtf = (time.time() - start) / (len(y) / self.fs)
        logging.info("feat2wav total RTF = %.06f", rtf)
        return y

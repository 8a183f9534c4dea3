"""Deterministic duration predictor (reference ``modules/duration_predictor.py:27-128``).

Conv stack (Conv1d -> ReLU -> LayerNorm -> Dropout) x N + linear head.
Training output is log-domain; inference converts with
``clamp(round(exp(x) - offset), min=0)``. The stochastic (flow) variant
lives in ``nn/flows.py`` / ``StochasticDurationPredictor``.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn

from .conv import Conv
import jax.numpy as jnp


class DurationPredictor(nn.Module):
    n_layers: int = 2
    n_chans: int = 384
    kernel_size: int = 3
    dropout_rate: float = 0.1
    offset: float = 1.0

    @nn.compact
    def __call__(
        self,
        xs: jnp.ndarray,
        x_masks: Optional[jnp.ndarray] = None,
        is_inference: bool = False,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """xs: (B, T, D); x_masks: (B, T) bool, True at PAD positions
        (matching the reference's mask convention here).

        Returns (B, T): log-duration predictions (train) or rounded
        durations (inference).
        """
        h = xs
        for _ in range(self.n_layers):
            h = Conv(self.n_chans, (self.kernel_size,), padding="SAME")(h)
            h = nn.relu(h)
            # espnet LayerNorm eps 1e-12 (reference duration_predictor.py:75)
            h = nn.LayerNorm(epsilon=1e-12)(h)
            h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        h = nn.Dense(1)(h)[..., 0]  # (B, T)
        if is_inference:
            h = jnp.maximum(jnp.round(jnp.exp(h) - self.offset), 0.0)
        if x_masks is not None:
            h = jnp.where(x_masks, 0.0, h)
        return h

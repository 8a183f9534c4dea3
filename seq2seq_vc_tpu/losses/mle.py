"""Flow negative log-likelihood loss (reference ``losses/mle_loss.py:5`` —
unused by shipped configs but part of the loss surface)."""

from __future__ import annotations

import math

import jax.numpy as jnp


class MLELoss:
    """NLL of z under a standard normal with flow log-determinant."""

    def __call__(self, z, logdet, mask):
        """z: (B, T, C) latents; logdet: (B,); mask: (B, T) valid frames."""
        m = mask.astype(z.dtype)[..., None]
        n = jnp.maximum(m.sum() * z.shape[-1], 1)
        nll = 0.5 * jnp.sum((z ** 2) * m) - jnp.sum(logdet)
        return nll / n + 0.5 * math.log(2 * math.pi)

"""Masked L2 between injected and predicted diffusion noise.

The reference registers this loss in its trainer hook
(``trainers/aas_vc.py:89-98``: ``criterion["DiffSingerL2Loss"](noise,
x_recon, olens)``) and imports ``losses/diffsinger_l2_loss`` in
``losses/__init__.py:7`` — but the file is absent from the snapshot, so the
diffsinger decoder path cannot train there. Native implementation with the
repo's masked_select+mean semantics (sum over valid / count of valid)."""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.masks import make_non_pad_mask


class DiffSingerL2Loss:
    def __init__(self, use_masking: bool = True, reduction: str = "mean"):
        assert reduction == "mean"
        self.use_masking = use_masking

    def __call__(self, noise, x_recon, olens):
        """noise / x_recon: (B, T, D); olens: (B,) valid frame counts on the
        same (reduced) time grid."""
        if self.use_masking:
            mask = make_non_pad_mask(olens, noise.shape[1]).astype(
                noise.dtype
            )[..., None]
        else:
            mask = jnp.ones_like(noise[..., :1])
        n = jnp.maximum(mask.sum() * noise.shape[-1], 1)
        return (jnp.square(x_recon - noise) * mask).sum() / n

"""Guided (diagonal) attention losses (reference
``losses/guided_attention_loss.py``): penalize attention mass far from the
diagonal with weight ``1 - exp(-(o/olen - i/ilen)^2 / (2 sigma^2))``.
Masks are computed on device from lengths — fixed shapes, no caching needed.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.masks import make_non_pad_mask


def _guided_attention_weights(ilens, olens, max_ilen: int, max_olen: int, sigma: float):
    """(B, max_olen, max_ilen) diagonal-distance penalty weights."""
    i = jnp.arange(max_ilen)[None, None, :]
    o = jnp.arange(max_olen)[None, :, None]
    ilens_f = jnp.maximum(ilens.astype(jnp.float32), 1)[:, None, None]
    olens_f = jnp.maximum(olens.astype(jnp.float32), 1)[:, None, None]
    d = i / ilens_f - o / olens_f
    return 1.0 - jnp.exp(-(d ** 2) / (2 * sigma ** 2))


class GuidedAttentionLoss:
    def __init__(self, sigma: float = 0.4, alpha: float = 1.0, reset_always: bool = True):
        self.sigma = sigma
        self.alpha = alpha

    def _loss(self, att_ws, ilens, olens, head_axes: int):
        max_olen, max_ilen = att_ws.shape[-2], att_ws.shape[-1]
        w = _guided_attention_weights(ilens, olens, max_ilen, max_olen, self.sigma)
        valid = (
            make_non_pad_mask(olens, max_olen)[:, :, None]
            & make_non_pad_mask(ilens, max_ilen)[:, None, :]
        )
        for _ in range(head_axes):
            w = w[:, None]
            valid = valid[:, None]
        sel = valid.astype(att_ws.dtype)
        # masked_select + mean: broadcasting sel against the head axis means
        # each selected position counts once per head
        num = (w * att_ws * sel).sum()
        den = jnp.maximum((jnp.ones_like(att_ws) * sel).sum(), 1)
        return self.alpha * num / den

    def __call__(self, att_ws, ilens, olens):
        """att_ws: (B, T_out, T_in)."""
        return self._loss(att_ws, ilens, olens, head_axes=0)


class GuidedMultiHeadAttentionLoss(GuidedAttentionLoss):
    def __call__(self, att_ws, ilens, olens):
        """att_ws: (B, H, T_out, T_in)."""
        return self._loss(att_ws, ilens, olens, head_axes=1)

"""Masked L1 loss for NAR models (reference ``losses/l1_loss.py``)."""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.masks import make_non_pad_mask


class L1Loss:
    def __init__(self, use_masking: bool = True, reduction: str = "mean"):
        assert reduction == "mean"
        self.use_masking = use_masking

    def __call__(self, after_outs, before_outs, ys, olens):
        if self.use_masking:
            mask = make_non_pad_mask(olens, ys.shape[1]).astype(ys.dtype)[..., None]
        else:
            mask = jnp.ones_like(ys[..., :1])
        n = jnp.maximum(mask.sum() * ys.shape[-1], 1)
        loss = (jnp.abs(before_outs - ys) * mask).sum() / n
        if after_outs is not None:
            loss = loss + (jnp.abs(after_outs - ys) * mask).sum() / n
        return loss

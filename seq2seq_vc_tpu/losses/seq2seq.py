"""Seq2seq (AR) loss: masked L1 + weighted stop-token BCE.

Semantics match reference ``losses/seq2seq_loss.py:20-66``: masked_select +
'mean' reduction becomes sum-over-valid / count-of-valid.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.masks import make_non_pad_mask


def _masked_mean(x, mask):
    return (x * mask).sum() / jnp.maximum(mask.sum(), 1)


def bce_with_logits(logits, labels, pos_weight: float = 1.0):
    """Elementwise weighted BCE-with-logits (torch semantics)."""
    softplus_neg = jnp.logaddexp(0.0, -logits)  # log(1 + e^-x)
    return (1.0 - labels) * logits + (1.0 + (pos_weight - 1.0) * labels) * softplus_neg


class Seq2SeqLoss:
    def __init__(self, bce_pos_weight: float = 10.0):
        self.bce_pos_weight = bce_pos_weight

    def __call__(self, after_outs, before_outs, logits, ys, labels, olens):
        """Returns (l1_loss, bce_loss).

        after_outs/before_outs/ys: (B, Lmax, odim); logits/labels: (B, Lmax);
        olens: (B,).
        """
        mask = make_non_pad_mask(olens, ys.shape[1]).astype(ys.dtype)  # (B, L)
        m3 = mask[..., None]
        n_feat = jnp.maximum(mask.sum() * ys.shape[-1], 1)
        l1 = (jnp.abs(after_outs - ys) * m3).sum() / n_feat
        l1 = l1 + (jnp.abs(before_outs - ys) * m3).sum() / n_feat
        bce = _masked_mean(
            bce_with_logits(logits, labels.astype(logits.dtype), self.bce_pos_weight),
            mask,
        )
        return l1, bce

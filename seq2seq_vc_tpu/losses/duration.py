"""Duration predictor losses (reference ``losses/duration_predictor_loss.py``)."""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.masks import make_non_pad_mask


class DurationPredictorLoss:
    """MSE in log domain between predicted log-durations and log(d + offset)."""

    def __init__(self, use_masking: bool = True, offset: float = 1.0, reduction: str = "mean"):
        assert reduction == "mean"
        self.use_masking = use_masking
        self.offset = offset

    def __call__(self, d_outs, ds, ilens):
        if self.use_masking:
            mask = make_non_pad_mask(ilens, ds.shape[1]).astype(d_outs.dtype)
        else:
            mask = jnp.ones_like(d_outs)
        target = jnp.log(ds.astype(jnp.float32) + self.offset)
        sq = (d_outs - target) ** 2 * mask
        return sq.sum() / jnp.maximum(mask.sum(), 1)


class StochasticDurationPredictorLoss:
    """Placeholder: the SDP returns its own NLL from the forward pass
    (reference ``losses/duration_predictor_loss.py:168-172`` is the same
    dummy); kept for config-name compatibility."""

    def __call__(self, *args, **kwargs):
        return None

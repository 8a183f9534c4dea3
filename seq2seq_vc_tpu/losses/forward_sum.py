"""Forward-sum alignment loss wrapper.

Adds the (host-computed, cached) beta-binomial prior to the attention
log-probs and evaluates the on-device CTC forward-sum (ops/forward_sum.py).
Matches reference ``losses/forward_sum_loss.py:12-116``.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ..ops.forward_sum import beta_binomial_prior, forward_sum_loss


class ForwardSumLoss:
    def __init__(self, cache_prior: bool = True):
        # the ops-level prior cache is global; flag kept for config parity
        self.cache_prior = cache_prior

    def __call__(self, log_p_attn, ilens, olens, blank_prob: float = math.exp(-1)):
        """log_p_attn: (B, T_feats, T_text); ilens/olens: (B,) lengths."""
        _, t_feats, t_text = log_p_attn.shape
        prior = beta_binomial_prior(
            np.asarray(ilens), np.asarray(olens), t_text, t_feats
        )
        biased = log_p_attn + jnp.asarray(prior)
        return forward_sum_loss(biased, ilens, olens, blank_prob=blank_prob)

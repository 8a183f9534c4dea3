"""Alignment learning module (reference ``modules/alignments.py:12-60``).

Text and feature conv towers -> negative L2 distance -> masked log-softmax
over the text axis, producing log_p_attn (B, T_feats, T_text) consumed by
MAS (ops/mas.py) and the forward-sum loss.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn

from .conv import Conv
import jax
import jax.numpy as jnp


class AlignmentModule(nn.Module):
    adim: int

    @nn.compact
    def __call__(
        self,
        text: jnp.ndarray,
        feats: jnp.ndarray,
        x_masks: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Args:
            text: (B, T_text, adim) token states.
            feats: (B, T_feats, odim) acoustic features.
            x_masks: (B, T_text) bool, True at PAD positions.

        Returns:
            (B, T_feats, T_text) log attention probabilities.
        """
        t = nn.relu(Conv(self.adim, (3,), padding="SAME", name="t_conv1")(text))
        t = Conv(self.adim, (1,), name="t_conv2")(t)

        f = nn.relu(Conv(self.adim, (3,), padding="SAME", name="f_conv1")(feats))
        f = nn.relu(Conv(self.adim, (3,), padding="SAME", name="f_conv2")(f))
        f = Conv(self.adim, (1,), name="f_conv3")(f)

        # -||f_t - t_k||_2 as score, via the matmul expansion
        # ||f||^2 + ||t||^2 - 2 f.t: the broadcast-difference form the
        # reference uses (alignments.py AlignmentModule) materializes a
        # (B, T_feats, T_text, C) tensor — 6.4 GB at arctic-vc2 train
        # scale, the single largest HBM stream in the step — while this
        # form is one MXU matmul with only the (B, T_feats, T_text)
        # result. HIGHEST precision keeps the cancellation error ~1e-5
        # absolute on the squared distance, invisible after log_softmax.
        f2 = jnp.sum(jnp.square(f), axis=-1)  # (B, T_feats)
        t2 = jnp.sum(jnp.square(t), axis=-1)  # (B, T_text)
        cross = jnp.einsum(
            "bfc,btc->bft", f, t, precision=jax.lax.Precision.HIGHEST
        )
        d2 = f2[:, :, None] + t2[:, None, :] - 2.0 * cross
        dist = jnp.sqrt(jnp.maximum(d2, 1e-12))
        score = -dist
        if x_masks is not None:
            score = jnp.where(x_masks[:, None, :], -jnp.inf, score)
        return nn.log_softmax(score, axis=-1)

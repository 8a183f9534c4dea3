"""Alignment learning module (reference ``modules/alignments.py:12-60``).

Text and feature conv towers -> negative L2 distance -> masked log-softmax
over the text axis, producing log_p_attn (B, T_feats, T_text) consumed by
MAS (ops/mas.py) and the forward-sum loss.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
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
        t = nn.relu(nn.Conv(self.adim, (3,), padding="SAME", name="t_conv1")(text))
        t = nn.Conv(self.adim, (1,), name="t_conv2")(t)

        f = nn.relu(nn.Conv(self.adim, (3,), padding="SAME", name="f_conv1")(feats))
        f = nn.relu(nn.Conv(self.adim, (3,), padding="SAME", name="f_conv2")(f))
        f = nn.Conv(self.adim, (1,), name="f_conv3")(f)

        # -||f_t - t_k||_2 as score; expanded-difference form keeps it exact
        dist = jnp.sqrt(
            jnp.maximum(
                jnp.sum((f[:, :, None, :] - t[:, None, :, :]) ** 2, axis=-1), 1e-12
            )
        )
        score = -dist
        if x_masks is not None:
            score = jnp.where(x_masks[:, None, :], -jnp.inf, score)
        return nn.log_softmax(score, axis=-1)

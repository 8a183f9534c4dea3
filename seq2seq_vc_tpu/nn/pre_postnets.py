"""Tacotron2-style prenet and postnet (reference ``modules/pre_postnets.py``).

The prenet applies dropout even at inference (essential for AR mel decoding
diversity/stability — reference note at ``pre_postnets.py:24-28``), so its
dropout is *never* deterministic and callers must provide a 'dropout' RNG
in every apply, including decode.

The postnet's BatchNorm is replaced by GroupNorm(1) by default (same
rationale and switch as the conformer conv module).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn

from .conv import Conv
import jax
import jax.numpy as jnp


class Prenet(nn.Module):
    idim: int
    n_layers: int = 2
    n_units: int = 256
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(self, x, rng=None):
        """Always-on dropout. Pass ``rng`` explicitly inside jit loops (e.g.
        the AR decode while_loop, where flax's make_rng is unavailable);
        otherwise the 'dropout' RNG collection is used."""
        for i in range(self.n_layers):
            x = nn.relu(nn.Dense(self.n_units)(x))
            key = self.make_rng("dropout") if rng is None else jax.random.fold_in(rng, i)
            keep = jax.random.bernoulli(key, 1.0 - self.dropout_rate, x.shape)
            x = jnp.where(keep, x / (1.0 - self.dropout_rate), 0.0)
        return x


class Postnet(nn.Module):
    odim: int
    n_layers: int = 5
    n_chans: int = 512
    n_filts: int = 5
    dropout_rate: float = 0.5
    use_norm: bool = True
    norm_type: str = "group_norm"  # 'group_norm' | 'batch_norm'
    dtype: Any = None  # computation dtype (norm stats fp32; output fp32)

    @nn.compact
    def __call__(self, xs, deterministic: bool = True, mask=None):
        """xs: (B, T, odim) -> (B, T, odim) residual refinement (not added).

        ``mask`` (B, T) bool valid-frame mask, DECODE-path only: invalid
        positions are re-zeroed after EVERY layer so each conv sees zeros
        past the boundary — exactly the per-layer zero padding the
        reference's exact-length decode postnet sees (masking only the
        input is NOT enough: layer 1's conv output just past the boundary
        is nonzero because it reads the last valid frames, and layer 2
        would smear it back in). With group_norm the statistics also
        ignore invalid frames, so decode outputs are invariant to the
        static padded-buffer size. Training call sites pass no mask on
        purpose — the reference's train-mode postnet reads padded frames
        (its norm sees them too), and the teacher-forcing forward parity
        tests pin that behavior."""
        from .conformer import MaskedGroupNorm

        h = xs if self.dtype is None else xs.astype(self.dtype)
        for layer in range(self.n_layers):
            is_last = layer == self.n_layers - 1
            ochans = self.odim if is_last else self.n_chans
            h = Conv(
                ochans, (self.n_filts,), padding="SAME", use_bias=False,
                dtype=self.dtype,
            )(h)
            if self.use_norm:
                if self.norm_type == "group_norm":
                    # named to keep the nn.GroupNorm checkpoint/converter
                    # layout; epsilon matches flax GroupNorm's default, so
                    # mask=None is numerically the previous behavior
                    h = MaskedGroupNorm(
                        epsilon=1e-6, name=f"GroupNorm_{layer}"
                    )(h, mask)
                elif self.norm_type == "batch_norm":
                    h = nn.BatchNorm(use_running_average=deterministic)(h)
                else:
                    raise ValueError(self.norm_type)
            if not is_last:
                h = nn.tanh(h)
            h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
            if mask is not None:
                h = jnp.where(mask[..., None], h, 0.0)
        return h.astype(xs.dtype)

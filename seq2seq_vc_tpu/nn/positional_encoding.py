"""Positional encodings.

Covers the variants the reference models use
(reference ``layers/positional_encoding.py:14,73,198,238``): absolute
sinusoidal, scaled (learnable alpha, used by VTN/TransformerTTS), and the
relative encodings feeding conformer rel-pos attention (legacy = positive
positions only; new style = symmetric ±(T-1)). The tables are computed
inside jit from static shapes, so they constant-fold into the compiled
graph.
"""

from __future__ import annotations

import math
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def sinusoidal_pe(length: int, d_model: int, dtype=jnp.float32) -> jnp.ndarray:
    """(length, d_model) sinusoidal table: sin on even dims, cos on odd."""
    position = np.arange(length, dtype=np.float64)[:, None]
    div_term = np.exp(
        np.arange(0, d_model, 2, dtype=np.float64) * -(math.log(10000.0) / d_model)
    )
    pe = np.zeros((length, d_model))
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return jnp.asarray(pe, dtype=dtype)


def relative_pe(length: int, d_model: int, dtype=jnp.float32) -> jnp.ndarray:
    """(2*length - 1, d_model) table for positions length-1 .. -(length-1).

    Matches the new-style espnet RelPositionalEncoding: index 0 is the most
    positive relative position, the center is 0, the end is most negative.
    """
    pos = np.arange(length - 1, -length, -1, dtype=np.float64)[:, None]
    div_term = np.exp(
        np.arange(0, d_model, 2, dtype=np.float64) * -(math.log(10000.0) / d_model)
    )
    pe = np.zeros((2 * length - 1, d_model))
    pe[:, 0::2] = np.sin(pos * div_term)
    pe[:, 1::2] = np.cos(pos * div_term)
    return jnp.asarray(pe, dtype=dtype)


class PositionalEncoding(nn.Module):
    """x * sqrt(d) + PE, then dropout."""

    d_model: int
    dropout_rate: float = 0.1

    def setup(self):
        self.dropout = nn.Dropout(self.dropout_rate)

    def __call__(self, x, deterministic: bool = True):
        pe = sinusoidal_pe(x.shape[1], self.d_model, x.dtype)
        x = x * math.sqrt(self.d_model) + pe[None]
        return self.dropout(x, deterministic=deterministic)

    def encode_at(self, x, t, maxlen: int):
        """Single-position variant for incremental decoding: x is (B, 1, d),
        t a traced index into a maxlen-sized table. No dropout (decode)."""
        import jax

        pe = sinusoidal_pe(maxlen, self.d_model, x.dtype)
        return x * math.sqrt(self.d_model) + jax.lax.dynamic_slice(
            pe, (t, 0), (1, self.d_model)
        )[None]


class ScaledPositionalEncoding(nn.Module):
    """x + alpha * PE with learnable scalar alpha (VTN/TransformerTTS)."""

    d_model: int
    dropout_rate: float = 0.1
    init_alpha: float = 1.0

    def setup(self):
        self.alpha = self.param(
            "alpha", lambda _: jnp.asarray(self.init_alpha, jnp.float32)
        )
        self.dropout = nn.Dropout(self.dropout_rate)

    def __call__(self, x, deterministic: bool = True):
        pe = sinusoidal_pe(x.shape[1], self.d_model, x.dtype)
        x = x + self.alpha * pe[None]
        return self.dropout(x, deterministic=deterministic)

    def encode_at(self, x, t, maxlen: int):
        import jax

        pe = sinusoidal_pe(maxlen, self.d_model, x.dtype)
        return x + self.alpha * jax.lax.dynamic_slice(pe, (t, 0), (1, self.d_model))[None]


class RelPositionalEncoding(nn.Module):
    """New-style relative PE: returns (x * sqrt(d), pos_emb of length 2T-1)."""

    d_model: int
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = x * math.sqrt(self.d_model)
        pos_emb = relative_pe(x.shape[1], self.d_model, x.dtype)[None]
        drop = nn.Dropout(self.dropout_rate)
        return (
            drop(x, deterministic=deterministic),
            drop(pos_emb, deterministic=deterministic),
        )


class LearnableFourierPosEnc(nn.Module):
    """Learnable Fourier features positional encoding
    (reference ``layers/positional_encoding.py:109``): x + [sin, cos](pos W)
    with a learnable (1, d/2) projection W, scaled by 1/sqrt(d)."""

    d_model: int
    dropout_rate: float = 0.1
    gamma: float = 1.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        assert self.d_model % 2 == 0
        w = self.param(
            "w_r",
            nn.initializers.normal(stddev=self.gamma / math.sqrt(self.d_model // 2)),
            (1, self.d_model // 2),
        )
        pos = jnp.arange(x.shape[1], dtype=jnp.float32)[:, None]  # (T, 1)
        proj = pos @ w  # (T, d/2)
        pe = jnp.concatenate([jnp.cos(proj), jnp.sin(proj)], axis=-1)
        pe = pe / math.sqrt(self.d_model)
        x = x + pe[None]
        return nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)


class StreamPositionalEncoding(nn.Module):
    """Positional encoding with an explicit start offset for streaming
    blocks (reference ``layers/positional_encoding.py:312``)."""

    d_model: int
    dropout_rate: float = 0.1

    def setup(self):
        self.dropout = nn.Dropout(self.dropout_rate)

    def __call__(self, x, start_idx: int = 0, deterministic: bool = True):
        pe = sinusoidal_pe(start_idx + x.shape[1], self.d_model, x.dtype)
        x = x * math.sqrt(self.d_model) + pe[None, start_idx : start_idx + x.shape[1]]
        return self.dropout(x, deterministic=deterministic)


class LegacyRelPositionalEncoding(nn.Module):
    """Legacy relative PE: positive positions only, pos_emb of length T."""

    d_model: int
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = x * math.sqrt(self.d_model)
        pos_emb = sinusoidal_pe(x.shape[1], self.d_model, x.dtype)[None]
        drop = nn.Dropout(self.dropout_rate)
        return (
            drop(x, deterministic=deterministic),
            drop(pos_emb, deterministic=deterministic),
        )

"""Shared model-level helpers (reduction reshapes, interpolation, lengths)."""

from __future__ import annotations

import jax.numpy as jnp


def reduce_frames(xs: jnp.ndarray, lens: jnp.ndarray, factor: int):
    """(B, T, D) -> (B, T//factor, D*factor) frame stacking; lens //= factor.

    T must already be a multiple of ``factor`` (pad in the collater); the
    reference instead truncates the remainder (``models/aas_vc.py:293-304``),
    which loses up to factor-1 frames — padding preserves them.
    """
    if factor <= 1:
        return xs, lens
    B, T, D = xs.shape
    assert T % factor == 0, f"pad time dim {T} to a multiple of {factor}"
    return xs.reshape(B, T // factor, D * factor), lens // factor


def expand_frames(xs: jnp.ndarray, factor: int, odim: int):
    """(B, T, odim*factor) -> (B, T*factor, odim) inverse of frame stacking."""
    if factor <= 1:
        return xs
    B, T, _ = xs.shape
    return xs.reshape(B, T * factor, odim)


def conv2d_subsampled_lengths(lens: jnp.ndarray) -> jnp.ndarray:
    """Length after two VALID stride-2 3x3 convs (reference ``vtn.py:277``)."""
    return ((lens - 2 + 1) // 2 - 2 + 1) // 2


def nearest_interpolate(x: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """Nearest-neighbor resize along time: (B, T, C) -> (B, out_len, C).

    Matches torch ``F.interpolate(mode='nearest')`` index arithmetic
    (floor(out_idx * T_in / T_out)).
    """
    t_in = x.shape[1]
    idx = (jnp.arange(out_len) * t_in // out_len).astype(jnp.int32)
    return x[:, idx, :]

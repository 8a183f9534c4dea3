"""Duration-driven upsampling / pooling ops, fixed-shape for TPU.

- ``gaussian_upsampling``: soft upsampler (reference
  ``modules/length_regulator.py:100-154``) — already matmul-shaped, runs on
  the MXU as (B, T_feats, T_text) @ (B, T_text, D).
- ``length_regulator``: hard repeat-interleave upsampler (reference
  ``length_regulator.py:46-97``). The reference builds ragged python lists;
  here the gather index is computed as a comparison against the duration
  cumsum so the op is fixed-shape and fully vectorized.
- ``average_by_duration``: token-level pooling of frame-level features
  (reference ``alignments.py:458-496``, numba) as a masked matmul.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gaussian_upsampling(hs, ds, h_masks=None, d_masks=None, delta: float = 0.1):
    """Upsample token states to frame rate with Gaussian attention.

    Args:
        hs: (B, T_text, D) token hidden states.
        ds: (B, T_text) durations (float or int frames).
        h_masks: optional (B, T_feats) bool, True at valid output frames.
            Required under jit to fix the output length.
        d_masks: optional (B, T_text) bool, True at valid tokens.
        delta: temperature.

    Returns:
        (B, T_feats, D) frame-rate states.
    """
    B, T_text, _ = hs.shape
    if h_masks is None:
        raise ValueError("gaussian_upsampling requires h_masks for a static output length")
    T_feats = h_masks.shape[1]
    ds = ds.astype(jnp.float32)

    t = jnp.arange(T_feats, dtype=jnp.float32)[None, :] * h_masks.astype(jnp.float32)
    c = jnp.cumsum(ds, axis=-1) - ds / 2  # (B, T_text)
    energy = -delta * (t[:, :, None] - c[:, None, :]) ** 2
    if d_masks is not None:
        energy = jnp.where(d_masks[:, None, :], energy, -jnp.inf)
    p_attn = jax.nn.softmax(energy, axis=2)  # (B, T_feats, T_text)
    return jnp.einsum("bft,btd->bfd", p_attn, hs.astype(jnp.float32))


def length_regulator(hs, ds, t_feats: int, pad_value: float = 0.0):
    """Hard repeat-interleave upsampling with a static output length.

    Frame t maps to the token whose cumulative-duration interval contains t:
    ``idx[t] = #{i : cumsum(ds)[i] <= t}``. Output frames past the total
    duration are filled with ``pad_value``.

    Args:
        hs: (B, T_text, D).
        ds: (B, T_text) integer durations.
        t_feats: static output frame count (>= max total duration).

    Returns:
        (B, t_feats, D) expanded states.
    """
    ds = ds.astype(jnp.int32)
    cum = jnp.cumsum(ds, axis=-1)  # (B, T_text)
    total = cum[:, -1]  # (B,)
    t = jnp.arange(t_feats)[None, :]  # (1, T_feats)
    idx = jnp.sum(t[:, :, None] >= cum[:, None, :], axis=-1)  # (B, T_feats)
    idx = jnp.minimum(idx, hs.shape[1] - 1)
    out = jnp.take_along_axis(hs, idx[..., None], axis=1)
    valid = (t < total[:, None])[..., None]
    return jnp.where(valid, out, pad_value)


def average_by_duration(ds, xs, text_lengths, feats_lengths):
    """Average frame-level scalars into token-level values by duration.

    Args:
        ds: (B, T_text) durations.
        xs: (B, T_feats) frame-level feature (e.g. pitch/energy).
        text_lengths: (B,) valid token counts.
        feats_lengths: (B,) valid frame counts.

    Returns:
        (B, T_text) token-level averages (0 where duration == 0).
    """
    ds = ds.astype(jnp.int32)
    B, T_text = ds.shape
    T_feats = xs.shape[1]
    cum = jnp.cumsum(ds, axis=-1)  # (B, T_text)
    start = cum - ds
    t = jnp.arange(T_feats)[None, None, :]  # (1, 1, T_feats)
    member = (t >= start[..., None]) & (t < cum[..., None])  # (B, T_text, T_feats)
    frame_valid = jnp.arange(T_feats)[None, :] < feats_lengths[:, None]
    member = member & frame_valid[:, None, :]
    sums = jnp.einsum("btf,bf->bt", member.astype(xs.dtype), xs)
    counts = member.sum(axis=-1)
    token_valid = jnp.arange(T_text)[None, :] < text_lengths[:, None]
    avg = jnp.where(counts > 0, sums / jnp.maximum(counts, 1), 0.0)
    return jnp.where(token_valid, avg, 0.0)

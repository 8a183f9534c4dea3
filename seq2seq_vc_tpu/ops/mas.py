"""Monotonic alignment search (Glow-TTS style) on device.

The reference runs this per batch item on CPU through numba
(``modules/alignments.py:63-93,281-310``), crossing the device->host
boundary inside the AAS-VC forward pass every step. Here the DP is a
vectorized ``lax.scan`` over mel frames — the inner max over text positions
is one VPU op per frame — and the backtrack is a second (reverse) scan, all
batched with ``vmap``, so alignment search stays on the TPU and overlaps
with the rest of the step under jit.

Semantics match the reference exactly (same DP, same tie-breaking:
``Q[i-1] >= Q[i]`` prefers the diagonal move) and are covered by tests
against an independent numpy implementation of the published algorithm.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def _mas_single(log_p_attn: jnp.ndarray, text_len: jnp.ndarray, feats_len: jnp.ndarray):
    """MAS for one (padded) item.

    Args:
        log_p_attn: (T_feats, T_text) log attention probabilities.
        text_len, feats_len: true lengths (traced scalars).

    Returns:
        path: (T_feats,) int32 aligned text index per mel frame (valid for
            frames < feats_len; padded frames hold text_len - 1).
        q: (T_feats, T_text) DP scores (for debugging).
    """
    T_feats, T_text = log_p_attn.shape
    lp = log_p_attn.T  # (T_text, T_feats)
    text_mask = jnp.arange(T_text) < text_len  # (T_text,)
    lp = jnp.where(text_mask[:, None], lp, _NEG_INF)

    # Forward DP: Q[i, j] = max(Q[i-1, j-1], Q[i, j-1]) + lp[i, j]
    q0 = jnp.full((T_text,), _NEG_INF).at[0].set(lp[0, 0])

    def fwd(q, lp_j):
        shifted = jnp.concatenate([jnp.full((1,), _NEG_INF), q[:-1]])
        q_new = jnp.maximum(shifted, q) + lp_j
        return q_new, q_new

    _, q_rest = jax.lax.scan(fwd, q0, lp[:, 1:].T, unroll=8)  # (T_feats-1, T_text)
    q = jnp.concatenate([q0[None], q_rest], axis=0)  # (T_feats, T_text)

    # Backtrack: A[feats_len-1] = text_len-1; for j descending,
    # choose i in {A[j+1]-1, A[j+1]} by comparing Q.
    last = text_len - 1

    def bwd(a_next, j):
        i_b = a_next
        i_a = jnp.maximum(a_next - 1, 0)
        q_a = q[j, i_a]
        q_b = q[j, i_b]
        choice = jnp.where(i_b == 0, 0, jnp.where(q_a >= q_b, i_a, i_b))
        # columns at/after the last valid frame pin to the final text index
        a_j = jnp.where(j >= feats_len - 1, last, choice)
        return a_j, a_j

    js = jnp.arange(T_feats - 1)[::-1]
    _, path_rev = jax.lax.scan(bwd, last, js, unroll=8)
    path = jnp.concatenate([path_rev[::-1], last[None]])
    return path.astype(jnp.int32), q


@jax.jit
def monotonic_alignment_search(log_p_attn, text_lengths, feats_lengths):
    """Batched MAS.

    Args:
        log_p_attn: (B, T_feats, T_text).
        text_lengths: (B,) int.
        feats_lengths: (B,) int.

    Returns:
        paths: (B, T_feats) int32 text index per frame.
    """
    paths, _ = jax.vmap(_mas_single)(log_p_attn, text_lengths, feats_lengths)
    return paths


@jax.jit
def viterbi_decode(log_p_attn, text_lengths, feats_lengths):
    """Durations + binarization loss from an attention log-prob matrix.

    Mirrors reference ``alignments.py:281-310``: per item, run MAS on the
    valid submatrix, histogram the path into durations, and accumulate
    ``-mean(log_p_attn[t, path[t]])`` over valid frames.

    Returns:
        ds: (B, T_text) float32 durations.
        bin_loss: scalar binarization loss (stop-gradient through the path,
            but NOT through log_p_attn — matching the reference, which
            detaches only the DP input, while the loss indexes the live
            tensor).
    """
    B, T_feats, T_text = log_p_attn.shape
    paths = monotonic_alignment_search(
        jax.lax.stop_gradient(log_p_attn), text_lengths, feats_lengths
    )

    frame_valid = jnp.arange(T_feats)[None, :] < feats_lengths[:, None]  # (B, T_feats)

    onehot = jax.nn.one_hot(paths, T_text, dtype=jnp.float32)  # (B, T_feats, T_text)
    ds = jnp.sum(onehot * frame_valid[..., None], axis=1)  # (B, T_text)

    picked = jnp.take_along_axis(log_p_attn, paths[..., None], axis=2)[..., 0]
    per_item = -jnp.sum(picked * frame_valid, axis=1) / jnp.maximum(feats_lengths, 1)
    bin_loss = jnp.mean(per_item)
    return ds, bin_loss

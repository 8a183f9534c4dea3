"""Pallas TPU flash attention.

Blocked online-softmax attention for the O(L^2) hot paths (SURVEY.md §3
hot-loop 2): grid (B*H, q_blocks, kv_blocks) with the kv axis innermost so
running max / normalizer / accumulator live in VMEM scratch across kv
steps; scores never materialize in HBM. Padding masks ride in as
scalar-prefetched per-batch key lengths; causal masking is positional.

Head dims are zero-padded to lane multiples (zeros change neither scores
nor outputs). Falls back to interpreter mode off-TPU so the same code path
is testable on CPU.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _flash_kernel(
    lens_ref,  # scalar prefetch: (B,) int32 kv lengths
    q_ref,  # (1, bq, D)
    k_ref,  # (1, bk, D)
    v_ref,  # (1, bk, D)
    o_ref,  # (1, bq, D)
    m_scr,  # (bq, 128) f32
    l_scr,  # (bq, 128) f32
    acc_scr,  # (bq, D) f32
    *,
    n_heads: int,
    block_q: int,
    block_kv: int,
    scale: float,
    causal: bool,
):
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    n_kv = pl.num_programs(2)

    @pl.when(ki == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (bq, bk)

    kv_pos = ki * block_kv + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    valid = kv_pos < lens_ref[bh // n_heads]
    if causal:
        q_pos = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        valid = valid & (kv_pos <= q_pos)
    s = jnp.where(valid, s, _NEG_INF)

    m_prev = m_scr[:, :1]  # (bq, 1)
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)  # (bq, bk)
    l_new = alpha * l_scr[:, :1] + jnp.sum(p, axis=-1, keepdims=True)

    pv = jax.lax.dot_general(
        p, v_ref[0], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    acc_scr[:] = acc_scr[:] * alpha + pv
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ki == n_kv - 1)
    def _():
        l = l_scr[:, :1]
        o_ref[0] = (acc_scr[:] / jnp.where(l == 0.0, 1.0, l)).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _block_rel_shift(raw: jnp.ndarray, b: int) -> jnp.ndarray:
    """Skew band scores raw (b, 2b), where column c' <-> key j = i - b + 1
    + c', into bd (b, b) with bd[i, j] = raw[i, j - i + b - 1].

    Implemented as a per-row rotation with row stride (Mosaic dynamic
    rotate): rolling row i right by (1 - b + i) mod 2b makes column j read
    raw[i, j + b - 1 - i]; valid reads never wrap into garbage.
    """
    shift = (1 - b) % (2 * b)  # roll requires a non-negative shift
    rolled = pltpu.roll(raw, shift=shift, axis=1, stride=1, stride_axis=0)
    return rolled[:, :b]


def _rel_flash_kernel(
    lens_ref,  # scalar prefetch: (B,) int32 kv lengths
    qu_ref,  # (1, b, D)   q + pos_bias_u
    qv_ref,  # (1, b, D)   q + pos_bias_v
    k_ref,  # (1, b, D)
    v_ref,  # (1, b, D)
    plo_ref,  # (1, b, D)  rel-pos table block lo
    phi_ref,  # (1, b, D)  rel-pos table block hi
    o_ref,  # (1, b, D)
    m_scr,
    l_scr,
    acc_scr,
    *,
    n_heads: int,
    block: int,
    scale: float,
):
    bh = pl.program_id(0)
    ki = pl.program_id(2)
    n_kv = pl.num_programs(2)

    @pl.when(ki == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    ac = jax.lax.dot_general(
        qu_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    p2 = jnp.concatenate([plo_ref[0], phi_ref[0]], axis=0)  # (2b, D)
    bd_raw = jax.lax.dot_general(
        qv_ref[0], p2, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (b, 2b); column c <-> i - j + b
    bd = _block_rel_shift(bd_raw, block)
    s = (ac + bd) * scale

    kv_pos = ki * block + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    valid = kv_pos < lens_ref[bh // n_heads]
    s = jnp.where(valid, s, _NEG_INF)

    m_prev = m_scr[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_new = alpha * l_scr[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        p, v_ref[0], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    acc_scr[:] = acc_scr[:] * alpha + pv
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ki == n_kv - 1)
    def _():
        l = l_scr[:, :1]
        o_ref[0] = (acc_scr[:] / jnp.where(l == 0.0, 1.0, l)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block", "interpret", "legacy"))
def rel_flash_attention(
    q_u: jnp.ndarray,
    q_v: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    pos: jnp.ndarray,
    kv_lens: Optional[jnp.ndarray] = None,
    block: int = 128,
    interpret: Optional[bool] = None,
    legacy: bool = False,
) -> jnp.ndarray:
    """Flash attention with Transformer-XL relative position scores.

    Computes softmax((q_u k^T + rel_shift(q_v p^T)) / sqrt(D)) v blockwise:
    for each (q block, kv block) pair only the two aligned rel-table blocks
    covering relative distances (qi - ki)*b + (-b, b) are fetched, and the
    (b, 2b) band is skewed into the (b, b) score tile in-register — the
    full (T, 2T-1) rel-score matrix never materializes.

    ``legacy=True`` reproduces the reference's
    LegacyRelPositionMultiHeadedAttention (``modules/transformer/
    attention.py:114-206``) exactly, including the view-based rel_shift's
    wrap-around semantics for future positions:

        bd[i, j] = qv_i     . p_{T-1-(i-j)}   for j <= i
        bd[i, j] = 0                          for j == i + 1
        bd[i, j] = qv_{i+1} . p_{j-i-2}       for j >= i + 2

    All three cases fold into ONE band matmul by concatenating the query
    features with a one-row-shifted copy ([qv_i, qv_{i+1}]) and stacking a
    second position table in the extra feature columns, so the legacy path
    reuses the same kernel at 2x the qv/pos feature width.

    Args:
        q_u, q_v: (B, H, T, D) queries with pos_bias_u / pos_bias_v added.
        k, v: (B, H, T, D).
        pos: head-split projected relative-position table. New style:
            (H, 2T-1, D), row p <-> relative distance T-1-p
            (RelPositionalEncoding order). Legacy: (H, T, D), row p <->
            absolute position p (LegacyRelPositionalEncoding order).
        kv_lens: (B,) valid key lengths.
        interpret: run the kernel in interpreter mode (None = auto: real
            kernel on TPU, interpreter elsewhere so tests run on CPU).
    Returns:
        (B, H, T, D) context.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, H, T, D = q_u.shape
    scale = 1.0 / math.sqrt(D)
    if kv_lens is None:
        kv_lens = jnp.full((B,), T, jnp.int32)
    kv_lens = kv_lens.astype(jnp.int32)

    b = block
    d_pad = _round_up(D, 128)
    t_pad = _round_up(T, b)
    n_blk = t_pad // b
    qw = 2 * d_pad if legacy else d_pad  # qv / pos-table feature width

    def padq(x):
        return jnp.pad(
            x, ((0, 0), (0, 0), (0, t_pad - T), (0, d_pad - D))
        ).reshape(B * H, t_pad, d_pad)

    qu, kp, vp = padq(q_u), padq(k), padq(v)
    if legacy:
        # columns [0, D): qv_i ; columns [d_pad, d_pad+D): qv_{i+1}
        q_next = jnp.pad(q_v[:, :, 1:], ((0, 0), (0, 0), (0, 1), (0, 0)))
        qv = jnp.zeros((B, H, t_pad, qw), q_v.dtype)
        qv = qv.at[:, :, :T, :D].set(q_v)
        qv = qv.at[:, :, :T, d_pad : d_pad + D].set(q_next)
        qv = qv.reshape(B * H, t_pad, qw)
    else:
        qv = padq(q_v)

    # rel table in DESCENDING distance order: row r <-> d = 2*t_pad - 1 - r
    # (matches RelPositionalEncoding row order, no reversal needed), so the
    # fetched band columns already correspond to increasing key index and
    # the in-kernel skew is a strided rotate. Entries outside +-(T-1) are
    # zero; they only meet masked or sliced-away positions.
    L = 3 * n_blk * b
    table = jnp.zeros((H, L, qw), pos.dtype)
    start = 2 * t_pad - T
    if legacy:
        # d >= 0 term: value p_{T-1-d} -> row r = start + p_idx, cols [0, D)
        table = jax.lax.dynamic_update_slice(
            table, jnp.pad(pos, ((0, 0), (0, 0), (0, qw - D))), (0, start, 0)
        )
        # d <= -2 term: value p_{-d-2} -> row r = 2*t_pad + 1 + p_idx,
        # cols [d_pad, d_pad+D). Only p rows < T-2 are ever met by valid
        # keys; cap additionally at t_pad-1 rows to stay inside the table.
        n_b = max(0, min(T - 2, t_pad - 1))
        if n_b > 0:
            table = jax.lax.dynamic_update_slice(
                table,
                jnp.pad(pos[:, :n_b], ((0, 0), (0, 0), (d_pad, qw - d_pad - D))),
                (0, 2 * t_pad + 1, 0),
            )
    else:
        # pos row p <-> d = T-1-p  ->  r = 2*t_pad - 1 - d = 2*t_pad - T + p
        table = jax.lax.dynamic_update_slice(
            table, jnp.pad(pos, ((0, 0), (0, 0), (0, d_pad - D))), (0, start, 0)
        )

    grid = (B * H, n_blk, n_blk)
    kernel = functools.partial(
        _rel_flash_kernel, n_heads=H, block=b, scale=scale
    )
    # lo block index = 2*n_blk - qi + ki - 1; hi = lo + 1: rows lo*b + c
    # hold distances d = (qi-ki)*b + b-1-c for c in [0, 2b)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, b, d_pad), lambda bh, qi, ki, lens: (bh, qi, 0)),
                pl.BlockSpec((1, b, qw), lambda bh, qi, ki, lens: (bh, qi, 0)),
                pl.BlockSpec((1, b, d_pad), lambda bh, qi, ki, lens: (bh, ki, 0)),
                pl.BlockSpec((1, b, d_pad), lambda bh, qi, ki, lens: (bh, ki, 0)),
                pl.BlockSpec(
                    (1, b, qw),
                    lambda bh, qi, ki, lens, nb=n_blk, H=H: (
                        bh % H, 2 * nb - qi + ki - 1, 0
                    ),
                ),
                pl.BlockSpec(
                    (1, b, qw),
                    lambda bh, qi, ki, lens, nb=n_blk, H=H: (
                        bh % H, 2 * nb - qi + ki, 0
                    ),
                ),
            ],
            out_specs=pl.BlockSpec((1, b, d_pad), lambda bh, qi, ki, lens: (bh, qi, 0)),
            scratch_shapes=[
                pltpu.VMEM((b, 128), jnp.float32),
                pltpu.VMEM((b, 128), jnp.float32),
                pltpu.VMEM((b, d_pad), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B * H, t_pad, d_pad), q_u.dtype),
        interpret=interpret,
    )(kv_lens, qu, qv, kp, vp, table, table)
    return out.reshape(B, H, t_pad, d_pad)[:, :, :T, :D]


@functools.partial(
    jax.jit,
    static_argnames=("causal", "block_q", "block_kv", "interpret"),
)
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_lens: Optional[jnp.ndarray] = None,
    causal: bool = False,
    block_q: int = 128,
    block_kv: int = 128,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Flash attention.

    Args:
        q: (B, H, Tq, D) queries.
        k, v: (B, H, Tk, D) keys/values.
        kv_lens: (B,) valid key lengths (padding mask); defaults to Tk.
        causal: apply a causal mask (Tq must equal Tk positionally).
        interpret: run the kernel in interpreter mode (None = auto: real
            kernel on TPU, interpreter elsewhere so tests run on CPU).
    Returns:
        (B, H, Tq, D) context. Fully-masked query rows return zeros.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, H, Tq, D = q.shape
    Tk = k.shape[2]
    scale = 1.0 / math.sqrt(D)

    if kv_lens is None:
        kv_lens = jnp.full((B,), Tk, jnp.int32)
    kv_lens = kv_lens.astype(jnp.int32)

    d_pad = _round_up(D, 128)
    tq_pad = _round_up(Tq, block_q)
    tk_pad = _round_up(Tk, block_kv)
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, tq_pad - Tq), (0, d_pad - D)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, tk_pad - Tk), (0, d_pad - D)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, tk_pad - Tk), (0, d_pad - D)))
    qp = qp.reshape(B * H, tq_pad, d_pad)
    kp = kp.reshape(B * H, tk_pad, d_pad)
    vp = vp.reshape(B * H, tk_pad, d_pad)

    grid = (B * H, tq_pad // block_q, tk_pad // block_kv)
    kernel = functools.partial(
        _flash_kernel,
        n_heads=H,
        block_q=block_q,
        block_kv=block_kv,
        scale=scale,
        causal=causal,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, d_pad), lambda bh, qi, ki, lens: (bh, qi, 0)),
                pl.BlockSpec((1, block_kv, d_pad), lambda bh, qi, ki, lens: (bh, ki, 0)),
                pl.BlockSpec((1, block_kv, d_pad), lambda bh, qi, ki, lens: (bh, ki, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_q, d_pad), lambda bh, qi, ki, lens: (bh, qi, 0)),
            scratch_shapes=[
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, d_pad), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B * H, tq_pad, d_pad), q.dtype),
        interpret=interpret,
    )(kv_lens, qp, kp, vp)
    out = out.reshape(B, H, tq_pad, d_pad)[:, :, :Tq, :D]
    return out

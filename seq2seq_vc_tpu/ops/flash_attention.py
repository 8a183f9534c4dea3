"""Pallas TPU flash attention — forward AND backward, with in-kernel dropout.

Blocked online-softmax attention for the O(L^2) hot paths (SURVEY.md §3
hot-loop 2): grid (B*H, q_blocks, kv_blocks) with the kv axis innermost so
running max / normalizer / accumulator live in VMEM scratch across kv
steps; scores never materialize in HBM. Padding masks ride in as
scalar-prefetched per-batch key lengths; causal masking is positional.

Training support (the reference trains every model with attention dropout,
e.g. ``transformer_enc_attn_dropout_rate: 0.2`` in
``egs/arctic/vc2/conf/aas_vc.melmelmel.v1.yaml``) needs two things the
classic inference kernel lacks:

* **A backward pass.** ``jax.custom_vjp`` cores recompute the score blocks
  from saved (out, logsumexp) FlashAttention-2 style, so the backward also
  never materializes the (T, T) score matrix: a dQ kernel accumulates over
  kv blocks, a dK/dV kernel accumulates over q blocks with the transposed
  grid, and (rel-pos only) a third kernel reduces the relative-position
  table gradient along score-matrix diagonals.
* **In-kernel dropout.** Instead of the Mosaic hardware PRNG (which has no
  CPU interpreter lowering, so kernels using it would be untestable in this
  repo's CPU test rig), dropout bits come from a counter-based hash
  (murmur3 finalizer) of the global score-element index: a pure function of
  (seed, b*h, q position, kv position) that the forward kernel, all three
  backward kernels, and the dense test oracle (``dense_dropout_keep``)
  evaluate identically on any backend. Dropout is applied torch-style to
  the *normalized* attention weights with 1/(1-p) scaling — the softmax
  normalizer sums the undropped probabilities — matching the reference's
  ``dropout(softmax(scores)) @ v`` (``modules/transformer/attention.py``).

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


# ---------------------------------------------------------------------------
# counter-based dropout hash (identical in kernels, backward, and tests)
# ---------------------------------------------------------------------------


def _mix_bits(idx: jnp.ndarray, seed: jnp.ndarray) -> jnp.ndarray:
    """murmur3 finalizer over a seeded element counter (uint32 avalanche)."""
    x = idx.astype(jnp.uint32) * jnp.uint32(0x9E3779B1) + seed.astype(jnp.uint32)
    x = x ^ (x >> jnp.uint32(16))
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> jnp.uint32(13))
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> jnp.uint32(16))
    return x


def _keep_from_bits(bits: jnp.ndarray, rate: float) -> jnp.ndarray:
    # >> 8 leaves 24 bits, so the int32 round-trip is lossless (Mosaic has
    # no direct uint32 -> float32 cast)
    u = (bits >> jnp.uint32(8)).astype(jnp.int32).astype(jnp.float32) * (
        1.0 / (1 << 24)
    )
    return u >= rate


def _keep_block(seed, bh, q0, k0, shape, rate: float, tq: int, tk: int):
    """Keep-mask for the (q0.., k0..) score block of head-batch ``bh``."""
    rows = q0 + jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    cols = k0 + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    idx = (bh * tq + rows) * tk + cols
    return _keep_from_bits(_mix_bits(idx, seed), rate)


def dense_dropout_keep(seed, n_bh: int, tq: int, tk: int, rate: float):
    """(BH, tq, tk) keep mask equal to the in-kernel mask (test oracle).

    ``tq``/``tk`` must be the PADDED lengths the kernel ran with
    (``ceil(T / block) * block``); slice afterwards.
    """
    shape = (n_bh, tq, tk)
    bh = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    idx = (bh * tq + rows) * tk + cols
    return _keep_from_bits(_mix_bits(idx, jnp.asarray(seed)), rate)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _seed_scalar(seed_ref) -> jnp.ndarray:
    return seed_ref[0]


# ---------------------------------------------------------------------------
# standard attention: forward kernel
# ---------------------------------------------------------------------------


def _flash_fwd_kernel(
    lens_ref,  # scalar prefetch: (B,) int32 kv lengths
    seed_ref,  # scalar prefetch: (1,) int32 dropout seed
    q_ref,  # (1, bq, D)
    k_ref,  # (1, bk, D)
    v_ref,  # (1, bk, D)
    o_ref,  # (1, bq, D)
    lse_ref,  # (1, bq, 128) f32 logsumexp (lane-broadcast)
    m_scr,  # (bq, 128) f32
    l_scr,  # (bq, 128) f32
    acc_scr,  # (bq, D) f32
    *,
    n_heads: int,
    block_q: int,
    block_kv: int,
    scale: float,
    causal: bool,
    rate: float,
    tq: int,
    tk: int,
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
    # explicit zero for masked entries: for a fully-masked row s == m_new
    # and exp(s - m_new) would otherwise be 1, not 0
    p = jnp.where(valid, jnp.exp(s - m_new), 0.0)  # (bq, bk)
    l_new = alpha * l_scr[:, :1] + jnp.sum(p, axis=-1, keepdims=True)

    if rate > 0.0:
        keep = _keep_block(
            _seed_scalar(seed_ref), bh, qi * block_q, ki * block_kv,
            s.shape, rate, tq, tk,
        )
        p_av = jnp.where(keep, p * (1.0 / (1.0 - rate)), 0.0)
    else:
        p_av = p

    pv = jax.lax.dot_general(
        p_av, v_ref[0], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    acc_scr[:] = acc_scr[:] * alpha + pv
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ki == n_kv - 1)
    def _():
        l = l_scr[:, :1]
        o_ref[0] = (acc_scr[:] / jnp.where(l == 0.0, 1.0, l)).astype(o_ref.dtype)
        lse = jnp.where(l > 0.0, m_scr[:, :1] + jnp.log(jnp.maximum(l, 1e-37)), _NEG_INF)
        lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:])


# ---------------------------------------------------------------------------
# standard attention: backward kernels
# ---------------------------------------------------------------------------


def _std_block_grads(
    q, k, v, do, o, lse_col, lens_val, q0, k0, seed, bh,
    *, scale, causal, rate, tq, tk,
):
    """Recompute (p_dropped, ds*scale) for one (q, kv) block pair.

    With out = sum_j pd_ij v_j (pd = keep*p/(1-r), p softmax-normalized):
      ds_ij = pd_ij * (dO_i . v_j) - p_ij * delta_i,  delta_i = dO_i . O_i.
    """
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    kv_pos = k0 + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    valid = kv_pos < lens_val
    if causal:
        q_pos = q0 + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        valid = valid & (kv_pos <= q_pos)
    p = jnp.where(valid, jnp.exp(s - lse_col), 0.0)

    delta = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1, keepdims=True
    )
    dp_raw = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bq, bk)
    if rate > 0.0:
        keep = _keep_block(seed, bh, q0, k0, s.shape, rate, tq, tk)
        pd = jnp.where(keep, p * (1.0 / (1.0 - rate)), 0.0)
        ds = pd * dp_raw - p * delta
    else:
        pd = p
        ds = p * (dp_raw - delta)
    return pd, ds * scale


def _flash_bwd_dq_kernel(
    lens_ref, seed_ref,
    q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref,
    dq_ref,
    dq_scr,
    *, n_heads, block_q, block_kv, scale, causal, rate, tq, tk,
):
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    n_kv = pl.num_programs(2)

    @pl.when(ki == 0)
    def _():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    _, ds_s = _std_block_grads(
        q_ref[0], k_ref[0], v_ref[0], do_ref[0], o_ref[0], lse_ref[0][:, :1],
        lens_ref[bh // n_heads], qi * block_q, ki * block_kv,
        _seed_scalar(seed_ref), bh,
        scale=scale, causal=causal, rate=rate, tq=tq, tk=tk,
    )
    dq_scr[:] += jax.lax.dot_general(
        ds_s, k_ref[0], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(ki == n_kv - 1)
    def _():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(
    lens_ref, seed_ref,
    q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref,
    dk_ref, dv_ref,
    dk_scr, dv_scr,
    *, n_heads, block_q, block_kv, scale, causal, rate, tq, tk,
):
    bh = pl.program_id(0)
    ki = pl.program_id(1)
    qi = pl.program_id(2)
    n_q = pl.num_programs(2)

    @pl.when(qi == 0)
    def _():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    pd, ds_s = _std_block_grads(
        q_ref[0], k_ref[0], v_ref[0], do_ref[0], o_ref[0], lse_ref[0][:, :1],
        lens_ref[bh // n_heads], qi * block_q, ki * block_kv,
        _seed_scalar(seed_ref), bh,
        scale=scale, causal=causal, rate=rate, tq=tq, tk=tk,
    )
    dv_scr[:] += jax.lax.dot_general(
        pd, do_ref[0], (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dk_scr[:] += jax.lax.dot_general(
        ds_s, q_ref[0], (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(qi == n_q - 1)
    def _():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# standard attention: custom-vjp core + public entry
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _flash_core(n_heads, block_q, block_kv, scale, causal, rate, interpret):
    common = dict(
        n_heads=n_heads, block_q=block_q, block_kv=block_kv,
        scale=scale, causal=causal, rate=rate,
    )

    def fwd_impl(lens, seed, q, k, v):
        bhn, tq_pad, d_pad = q.shape
        tk_pad = k.shape[1]
        grid = (bhn, tq_pad // block_q, tk_pad // block_kv)
        kernel = functools.partial(
            _flash_fwd_kernel, tq=tq_pad, tk=tk_pad, **common
        )
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((1, block_q, d_pad), lambda bh, qi, ki, *_: (bh, qi, 0)),
                    pl.BlockSpec((1, block_kv, d_pad), lambda bh, qi, ki, *_: (bh, ki, 0)),
                    pl.BlockSpec((1, block_kv, d_pad), lambda bh, qi, ki, *_: (bh, ki, 0)),
                ],
                out_specs=[
                    pl.BlockSpec((1, block_q, d_pad), lambda bh, qi, ki, *_: (bh, qi, 0)),
                    pl.BlockSpec((1, block_q, 128), lambda bh, qi, ki, *_: (bh, qi, 0)),
                ],
                scratch_shapes=[
                    pltpu.VMEM((block_q, 128), jnp.float32),
                    pltpu.VMEM((block_q, 128), jnp.float32),
                    pltpu.VMEM((block_q, d_pad), jnp.float32),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((bhn, tq_pad, d_pad), q.dtype),
                jax.ShapeDtypeStruct((bhn, tq_pad, 128), jnp.float32),
            ],
            interpret=interpret,
        )(lens, seed, q, k, v)

    @jax.custom_vjp
    def core(lens, seed, q, k, v):
        return fwd_impl(lens, seed, q, k, v)[0]

    def core_fwd(lens, seed, q, k, v):
        out, lse = fwd_impl(lens, seed, q, k, v)
        return out, (lens, seed, q, k, v, out, lse)

    def core_bwd(res, g):
        lens, seed, q, k, v, out, lse = res
        bhn, tq_pad, d_pad = q.shape
        tk_pad = k.shape[1]
        nq, nkv = tq_pad // block_q, tk_pad // block_kv
        kern = dict(tq=tq_pad, tk=tk_pad, **common)

        in_arrays = (lens, seed, q, k, v, g, out, lse)
        q_specs = [
            pl.BlockSpec((1, block_q, d_pad), lambda bh, qi, ki, *_: (bh, qi, 0)),
            pl.BlockSpec((1, block_kv, d_pad), lambda bh, qi, ki, *_: (bh, ki, 0)),
            pl.BlockSpec((1, block_kv, d_pad), lambda bh, qi, ki, *_: (bh, ki, 0)),
            pl.BlockSpec((1, block_q, d_pad), lambda bh, qi, ki, *_: (bh, qi, 0)),
            pl.BlockSpec((1, block_q, d_pad), lambda bh, qi, ki, *_: (bh, qi, 0)),
            pl.BlockSpec((1, block_q, 128), lambda bh, qi, ki, *_: (bh, qi, 0)),
        ]
        dq = pl.pallas_call(
            functools.partial(_flash_bwd_dq_kernel, **kern),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(bhn, nq, nkv),
                in_specs=q_specs,
                out_specs=pl.BlockSpec(
                    (1, block_q, d_pad), lambda bh, qi, ki, *_: (bh, qi, 0)
                ),
                scratch_shapes=[pltpu.VMEM((block_q, d_pad), jnp.float32)],
            ),
            out_shape=jax.ShapeDtypeStruct((bhn, tq_pad, d_pad), q.dtype),
            interpret=interpret,
        )(*in_arrays)

        kv_specs = [
            pl.BlockSpec((1, block_q, d_pad), lambda bh, ki, qi, *_: (bh, qi, 0)),
            pl.BlockSpec((1, block_kv, d_pad), lambda bh, ki, qi, *_: (bh, ki, 0)),
            pl.BlockSpec((1, block_kv, d_pad), lambda bh, ki, qi, *_: (bh, ki, 0)),
            pl.BlockSpec((1, block_q, d_pad), lambda bh, ki, qi, *_: (bh, qi, 0)),
            pl.BlockSpec((1, block_q, d_pad), lambda bh, ki, qi, *_: (bh, qi, 0)),
            pl.BlockSpec((1, block_q, 128), lambda bh, ki, qi, *_: (bh, qi, 0)),
        ]
        dk, dv = pl.pallas_call(
            functools.partial(_flash_bwd_dkv_kernel, **kern),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(bhn, nkv, nq),
                in_specs=kv_specs,
                out_specs=[
                    pl.BlockSpec((1, block_kv, d_pad), lambda bh, ki, qi, *_: (bh, ki, 0)),
                    pl.BlockSpec((1, block_kv, d_pad), lambda bh, ki, qi, *_: (bh, ki, 0)),
                ],
                scratch_shapes=[
                    pltpu.VMEM((block_kv, d_pad), jnp.float32),
                    pltpu.VMEM((block_kv, d_pad), jnp.float32),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((bhn, tk_pad, d_pad), k.dtype),
                jax.ShapeDtypeStruct((bhn, tk_pad, d_pad), v.dtype),
            ],
            interpret=interpret,
        )(*in_arrays)
        return None, None, dq, dk, dv

    core.defvjp(core_fwd, core_bwd)
    return core


@functools.partial(
    jax.jit,
    static_argnames=("causal", "block_q", "block_kv", "interpret", "dropout_rate"),
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
    dropout_rate: float = 0.0,
    dropout_seed: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Flash attention (differentiable, optional in-kernel dropout).

    Args:
        q: (B, H, Tq, D) queries.
        k, v: (B, H, Tk, D) keys/values.
        kv_lens: (B,) valid key lengths (padding mask); defaults to Tk.
        causal: apply a causal mask (Tq must equal Tk positionally).
        interpret: run the kernel in interpreter mode (None = auto: real
            kernel on TPU, interpreter elsewhere so tests run on CPU).
        dropout_rate: attention-weight dropout probability (applied to the
            normalized weights with 1/(1-p) scaling, torch semantics).
        dropout_seed: (1,) int32 seed; required when dropout_rate > 0. The
            forward and backward passes regenerate the identical mask.
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
    if dropout_rate > 0.0 and dropout_seed is None:
        raise ValueError("dropout_rate > 0 requires dropout_seed")
    seed = (
        jnp.zeros((1,), jnp.int32)
        if dropout_seed is None
        else dropout_seed.reshape((1,)).astype(jnp.int32)
    )

    d_pad = _round_up(D, 128)
    tq_pad = _round_up(Tq, block_q)
    tk_pad = _round_up(Tk, block_kv)
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, tq_pad - Tq), (0, d_pad - D)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, tk_pad - Tk), (0, d_pad - D)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, tk_pad - Tk), (0, d_pad - D)))
    qp = qp.reshape(B * H, tq_pad, d_pad)
    kp = kp.reshape(B * H, tk_pad, d_pad)
    vp = vp.reshape(B * H, tk_pad, d_pad)

    core = _flash_core(
        H, block_q, block_kv, scale, causal, float(dropout_rate), interpret
    )
    out = core(kv_lens, seed, qp, kp, vp)
    return out.reshape(B, H, tq_pad, d_pad)[:, :, :Tq, :D]


# ---------------------------------------------------------------------------
# relative-position attention: shared block math
# ---------------------------------------------------------------------------


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


def _block_rel_unshift_flipped(g: jnp.ndarray, b: int) -> jnp.ndarray:
    """Column-REVERSED transpose of :func:`_block_rel_shift`.

    The true band transpose is d_raw[i, c] = g[i, c - (b-1) + i] (a per-row
    roll with stride -1), but Mosaic's dynamic_rotate only takes
    non-negative strides. Conjugating by column reversal F turns stride -1
    into stride +1:  d_raw = F(roll(F(pad(g)), shift=b+1, stride=1)).
    This helper returns y = F(d_raw) — the reversal is ONE exact
    anti-diagonal permutation matmul (HIGHEST precision is bit-exact: each
    output element is x*1 with full f32 reconstruction) because
    F(pad(g)) = [0 | g F_b]; the OUTER reversal is never materialized —
    callers fold it into their next contraction:

      d_raw @ p2   == y @ reversed(p2)     (row-reversed table, built in XLA)
      d_raw^T @ qv == row-reverse(y^T @ qv) (accumulate the reversed table
                                             gradient; un-reverse in XLA)
    """
    n = g.shape[1]
    rr = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    anti = (rr + cc == n - 1).astype(g.dtype)
    g_rev = jax.lax.dot_general(
        g, anti, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    z = jnp.concatenate([jnp.zeros_like(g_rev), g_rev], axis=1)  # (b, 2b)
    return pltpu.roll(z, shift=(b + 1) % (2 * b), stride=1, axis=1, stride_axis=0)


def _rel_scores(qu, qv, k, plo, phi, *, block: int, scale: float):
    """((ac + skew(band)) * scale, p2) for one block pair."""
    p2 = jnp.concatenate([plo, phi], axis=0)  # (2b, qw)
    ac = jax.lax.dot_general(
        qu, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    bd_raw = jax.lax.dot_general(
        qv, p2, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (b, 2b); column c <-> i - j + b
    bd = _block_rel_shift(bd_raw, block)
    return (ac + bd) * scale, p2


def _rel_block_grads(
    qu, qv, k, v, plo, phi, do, o, lse_col, lens_val, q0, k0, seed, bh,
    *, block, scale, rate, tq, tk,
):
    """Recompute (p_dropped, ds*scale, p2) for one rel-pos block pair.

    Out-of-range diagonal partners in the dpos kernel are handled by
    pl.when guards around the whole contribution, not here.
    """
    s, p2 = _rel_scores(qu, qv, k, plo, phi, block=block, scale=scale)
    kv_pos = k0 + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    valid = kv_pos < lens_val
    p = jnp.where(valid, jnp.exp(s - lse_col), 0.0)

    delta = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1, keepdims=True
    )
    dp_raw = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if rate > 0.0:
        keep = _keep_block(seed, bh, q0, k0, s.shape, rate, tq, tk)
        pd = jnp.where(keep, p * (1.0 / (1.0 - rate)), 0.0)
        ds = pd * dp_raw - p * delta
    else:
        pd = p
        ds = p * (dp_raw - delta)
    return pd, ds * scale, p2


# ---------------------------------------------------------------------------
# relative-position attention: forward kernel
# ---------------------------------------------------------------------------


def _rel_fwd_kernel(
    lens_ref,  # scalar prefetch: (B,) int32 kv lengths
    seed_ref,  # scalar prefetch: (1,) int32 dropout seed
    qu_ref,  # (1, b, D)   q + pos_bias_u
    qv_ref,  # (1, b, QW)  q + pos_bias_v (legacy: doubled feature width)
    k_ref,  # (1, b, D)
    v_ref,  # (1, b, D)
    plo_ref,  # (1, b, QW)  rel-pos table block lo
    phi_ref,  # (1, b, QW)  rel-pos table block hi
    o_ref,  # (1, b, D)
    lse_ref,  # (1, b, 128)
    m_scr,
    l_scr,
    acc_scr,
    *,
    n_heads: int,
    block: int,
    scale: float,
    rate: float,
    tq: int,
    tk: int,
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

    s, _ = _rel_scores(
        qu_ref[0], qv_ref[0], k_ref[0], plo_ref[0], phi_ref[0],
        block=block, scale=scale,
    )
    kv_pos = ki * block + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    valid = kv_pos < lens_ref[bh // n_heads]
    s = jnp.where(valid, s, _NEG_INF)

    m_prev = m_scr[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.where(valid, jnp.exp(s - m_new), 0.0)
    l_new = alpha * l_scr[:, :1] + jnp.sum(p, axis=-1, keepdims=True)

    if rate > 0.0:
        keep = _keep_block(
            _seed_scalar(seed_ref), bh, qi * block, ki * block,
            s.shape, rate, tq, tk,
        )
        p_av = jnp.where(keep, p * (1.0 / (1.0 - rate)), 0.0)
    else:
        p_av = p

    pv = jax.lax.dot_general(
        p_av, v_ref[0], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    acc_scr[:] = acc_scr[:] * alpha + pv
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ki == n_kv - 1)
    def _():
        l = l_scr[:, :1]
        o_ref[0] = (acc_scr[:] / jnp.where(l == 0.0, 1.0, l)).astype(o_ref.dtype)
        lse = jnp.where(l > 0.0, m_scr[:, :1] + jnp.log(jnp.maximum(l, 1e-37)), _NEG_INF)
        lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:])


# ---------------------------------------------------------------------------
# relative-position attention: backward kernels
# ---------------------------------------------------------------------------


def _rel_bwd_dq_kernel(
    lens_ref, seed_ref,
    qu_ref, qv_ref, k_ref, v_ref, plo_ref, phi_ref,
    rlo_ref, rhi_ref,  # row-REVERSED table blocks (see _block_rel_unshift_flipped)
    do_ref, o_ref, lse_ref,
    dqu_ref, dqv_ref,
    dqu_scr, dqv_scr,
    *, n_heads, block, scale, rate, tq, tk,
):
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    n_kv = pl.num_programs(2)

    @pl.when(ki == 0)
    def _():
        dqu_scr[:] = jnp.zeros_like(dqu_scr)
        dqv_scr[:] = jnp.zeros_like(dqv_scr)

    _, ds_s, _ = _rel_block_grads(
        qu_ref[0], qv_ref[0], k_ref[0], v_ref[0], plo_ref[0], phi_ref[0],
        do_ref[0], o_ref[0], lse_ref[0][:, :1],
        lens_ref[bh // n_heads], qi * block, ki * block,
        _seed_scalar(seed_ref), bh,
        block=block, scale=scale, rate=rate, tq=tq, tk=tk,
    )
    dqu_scr[:] += jax.lax.dot_general(
        ds_s, k_ref[0], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    y = _block_rel_unshift_flipped(ds_s, block)  # (b, 2b) column-reversed band
    p2_rev = jnp.concatenate([rlo_ref[0], rhi_ref[0]], axis=0)  # (2b, qw)
    dqv_scr[:] += jax.lax.dot_general(
        y, p2_rev, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(ki == n_kv - 1)
    def _():
        dqu_ref[0] = dqu_scr[:].astype(dqu_ref.dtype)
        dqv_ref[0] = dqv_scr[:].astype(dqv_ref.dtype)


def _rel_bwd_dkv_kernel(
    lens_ref, seed_ref,
    qu_ref, qv_ref, k_ref, v_ref, plo_ref, phi_ref, do_ref, o_ref, lse_ref,
    dk_ref, dv_ref,
    dk_scr, dv_scr,
    *, n_heads, block, scale, rate, tq, tk,
):
    bh = pl.program_id(0)
    ki = pl.program_id(1)
    qi = pl.program_id(2)
    n_q = pl.num_programs(2)

    @pl.when(qi == 0)
    def _():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    pd, ds_s, _ = _rel_block_grads(
        qu_ref[0], qv_ref[0], k_ref[0], v_ref[0], plo_ref[0], phi_ref[0],
        do_ref[0], o_ref[0], lse_ref[0][:, :1],
        lens_ref[bh // n_heads], qi * block, ki * block,
        _seed_scalar(seed_ref), bh,
        block=block, scale=scale, rate=rate, tq=tq, tk=tk,
    )
    dv_scr[:] += jax.lax.dot_general(
        pd, do_ref[0], (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dk_scr[:] += jax.lax.dot_general(
        ds_s, qu_ref[0], (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(qi == n_q - 1)
    def _():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _rel_bwd_dpos_kernel(
    lens_ref, seed_ref,
    qu_ref, qv_ref, do_ref, o_ref, lse_ref,
    ka_ref, va_ref, kb_ref, vb_ref,
    pa_lo_ref, pab_ref, pb_hi_ref,
    dtab_ref,
    acc_scr,
    *, n_heads, n_batch, block, scale, rate, tq, tk, n_kv,
):
    """REVERSED relative-position-table gradient, reduced along diagonals.

    Works in the row-reversed table space (rev row x~ = L-1-x; the caller
    un-reverses in XLA) because the in-kernel band transpose produces a
    column-reversed band y = F(d_raw) (see _block_rel_unshift_flipped):
    y^T qv rows c~ map contiguously onto rev-table rows
    (n_tab - 2 - lo)*b + c~ for the pair's 'lo' diagonal block.

    Rev block rho therefore receives y^T qv [0:b) from pair A
    (lo = 3*n_kv - 2 - rho, ki = qi + n_kv - 1 - rho) and [b, 2b) from
    pair B (lo = 3*n_kv - 1 - rho, ki = qi + n_kv - rho). Grid
    (H, n_tab, B, nq) with (B, qi) innermost revisits the same output
    block contiguously, so a VMEM scratch accumulates the full sum over
    batch and diagonal before one HBM write.
    """
    h = pl.program_id(0)
    rho = pl.program_id(1)
    bi = pl.program_id(2)
    qi = pl.program_id(3)
    n_q = pl.num_programs(3)
    bh = bi * n_heads + h

    @pl.when((bi == 0) & (qi == 0))
    def _():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    b = block
    ki_a = qi + n_kv - 1 - rho
    ki_b = qi + n_kv - rho
    lse_col = lse_ref[0][:, :1]
    lens_val = lens_ref[bi]
    seed = _seed_scalar(seed_ref)

    @pl.when((ki_a >= 0) & (ki_a < n_kv))
    def _():
        _, ds_s, _ = _rel_block_grads(
            qu_ref[0], qv_ref[0], ka_ref[0], va_ref[0], pa_lo_ref[0], pab_ref[0],
            do_ref[0], o_ref[0], lse_col, lens_val, qi * b, ki_a * b, seed, bh,
            block=b, scale=scale, rate=rate, tq=tq, tk=tk,
        )
        y = _block_rel_unshift_flipped(ds_s, b)  # (b, 2b)
        c = jax.lax.dot_general(
            y, qv_ref[0], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (2b, qw), rows in rev-table order
        acc_scr[:] += c[:b]

    @pl.when((ki_b >= 0) & (ki_b < n_kv))
    def _():
        _, ds_s, _ = _rel_block_grads(
            qu_ref[0], qv_ref[0], kb_ref[0], vb_ref[0], pab_ref[0], pb_hi_ref[0],
            do_ref[0], o_ref[0], lse_col, lens_val, qi * b, ki_b * b, seed, bh,
            block=b, scale=scale, rate=rate, tq=tq, tk=tk,
        )
        y = _block_rel_unshift_flipped(ds_s, b)
        c = jax.lax.dot_general(
            y, qv_ref[0], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scr[:] += c[b:]

    @pl.when((bi == n_batch - 1) & (qi == n_q - 1))
    def _():
        dtab_ref[0] = acc_scr[:].astype(dtab_ref.dtype)


# ---------------------------------------------------------------------------
# relative-position attention: custom-vjp core + public entry
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _rel_core(n_heads, block, scale, rate, interpret):
    b = block
    common = dict(n_heads=n_heads, block=b, scale=scale, rate=rate)

    def fwd_impl(lens, seed, qu, qv, k, v, table):
        bhn, t_pad, d_pad = qu.shape
        qw = qv.shape[-1]
        n_blk = t_pad // b
        grid = (bhn, n_blk, n_blk)
        kernel = functools.partial(_rel_fwd_kernel, tq=t_pad, tk=t_pad, **common)
        # lo block index = 2*n_blk - qi + ki - 1; hi = lo + 1: rows lo*b + c
        # hold distances d = (qi-ki)*b + b-1-c for c in [0, 2b)
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((1, b, d_pad), lambda bh, qi, ki, *_: (bh, qi, 0)),
                    pl.BlockSpec((1, b, qw), lambda bh, qi, ki, *_: (bh, qi, 0)),
                    pl.BlockSpec((1, b, d_pad), lambda bh, qi, ki, *_: (bh, ki, 0)),
                    pl.BlockSpec((1, b, d_pad), lambda bh, qi, ki, *_: (bh, ki, 0)),
                    pl.BlockSpec(
                        (1, b, qw),
                        lambda bh, qi, ki, *_, nb=n_blk, H=n_heads: (
                            bh % H, 2 * nb - qi + ki - 1, 0
                        ),
                    ),
                    pl.BlockSpec(
                        (1, b, qw),
                        lambda bh, qi, ki, *_, nb=n_blk, H=n_heads: (
                            bh % H, 2 * nb - qi + ki, 0
                        ),
                    ),
                ],
                out_specs=[
                    pl.BlockSpec((1, b, d_pad), lambda bh, qi, ki, *_: (bh, qi, 0)),
                    pl.BlockSpec((1, b, 128), lambda bh, qi, ki, *_: (bh, qi, 0)),
                ],
                scratch_shapes=[
                    pltpu.VMEM((b, 128), jnp.float32),
                    pltpu.VMEM((b, 128), jnp.float32),
                    pltpu.VMEM((b, d_pad), jnp.float32),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((bhn, t_pad, d_pad), qu.dtype),
                jax.ShapeDtypeStruct((bhn, t_pad, 128), jnp.float32),
            ],
            interpret=interpret,
        )(lens, seed, qu, qv, k, v, table, table)

    @jax.custom_vjp
    def core(lens, seed, qu, qv, k, v, table):
        return fwd_impl(lens, seed, qu, qv, k, v, table)[0]

    def core_fwd(lens, seed, qu, qv, k, v, table):
        out, lse = fwd_impl(lens, seed, qu, qv, k, v, table)
        return out, (lens, seed, qu, qv, k, v, table, out, lse)

    def core_bwd(res, g):
        lens, seed, qu, qv, k, v, table, out, lse = res
        bhn, t_pad, d_pad = qu.shape
        qw = qv.shape[-1]
        n_blk = t_pad // b
        n_batch = bhn // n_heads
        L = table.shape[1]
        kern = dict(tq=t_pad, tk=t_pad, **common)
        # row-reversed table: the in-kernel band transpose emits a
        # column-reversed band (Mosaic has no negative-stride rotate), so
        # its table-side contractions consume/produce reversed rows
        table_rev = table[:, ::-1, :]

        dq_arrays = (lens, seed, qu, qv, k, v, table, table, table_rev,
                     table_rev, g, out, lse)
        dkv_arrays = (lens, seed, qu, qv, k, v, table, table, g, out, lse)

        def spec_q(dim):
            return pl.BlockSpec((1, b, dim), lambda bh, qi, ki, *_: (bh, qi, 0))

        def spec_k(dim):
            return pl.BlockSpec((1, b, dim), lambda bh, qi, ki, *_: (bh, ki, 0))

        dq_in_specs = [
            spec_q(d_pad), spec_q(qw), spec_k(d_pad), spec_k(d_pad),
            pl.BlockSpec(
                (1, b, qw),
                lambda bh, qi, ki, *_, nb=n_blk, H=n_heads: (bh % H, 2 * nb - qi + ki - 1, 0),
            ),
            pl.BlockSpec(
                (1, b, qw),
                lambda bh, qi, ki, *_, nb=n_blk, H=n_heads: (bh % H, 2 * nb - qi + ki, 0),
            ),
            # reversed-p2 blocks: lo_rev = n_tab - 2 - lo = nb - 1 + qi - ki
            pl.BlockSpec(
                (1, b, qw),
                lambda bh, qi, ki, *_, nb=n_blk, H=n_heads: (bh % H, nb - 1 + qi - ki, 0),
            ),
            pl.BlockSpec(
                (1, b, qw),
                lambda bh, qi, ki, *_, nb=n_blk, H=n_heads: (bh % H, nb + qi - ki, 0),
            ),
            spec_q(d_pad), spec_q(d_pad), spec_q(128),
        ]
        dqu, dqv = pl.pallas_call(
            functools.partial(_rel_bwd_dq_kernel, **kern),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(bhn, n_blk, n_blk),
                in_specs=dq_in_specs,
                out_specs=[
                    pl.BlockSpec((1, b, d_pad), lambda bh, qi, ki, *_: (bh, qi, 0)),
                    pl.BlockSpec((1, b, qw), lambda bh, qi, ki, *_: (bh, qi, 0)),
                ],
                scratch_shapes=[
                    pltpu.VMEM((b, d_pad), jnp.float32),
                    pltpu.VMEM((b, qw), jnp.float32),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((bhn, t_pad, d_pad), qu.dtype),
                jax.ShapeDtypeStruct((bhn, t_pad, qw), qv.dtype),
            ],
            interpret=interpret,
        )(*dq_arrays)

        def kspec_q(dim):
            return pl.BlockSpec((1, b, dim), lambda bh, ki, qi, *_: (bh, qi, 0))

        def kspec_k(dim):
            return pl.BlockSpec((1, b, dim), lambda bh, ki, qi, *_: (bh, ki, 0))

        dkv_in_specs = [
            kspec_q(d_pad), kspec_q(qw), kspec_k(d_pad), kspec_k(d_pad),
            pl.BlockSpec(
                (1, b, qw),
                lambda bh, ki, qi, *_, nb=n_blk, H=n_heads: (bh % H, 2 * nb - qi + ki - 1, 0),
            ),
            pl.BlockSpec(
                (1, b, qw),
                lambda bh, ki, qi, *_, nb=n_blk, H=n_heads: (bh % H, 2 * nb - qi + ki, 0),
            ),
            kspec_q(d_pad), kspec_q(d_pad), kspec_q(128),
        ]
        dk, dv = pl.pallas_call(
            functools.partial(_rel_bwd_dkv_kernel, **kern),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(bhn, n_blk, n_blk),
                in_specs=dkv_in_specs,
                out_specs=[
                    pl.BlockSpec((1, b, d_pad), lambda bh, ki, qi, *_: (bh, ki, 0)),
                    pl.BlockSpec((1, b, d_pad), lambda bh, ki, qi, *_: (bh, ki, 0)),
                ],
                scratch_shapes=[
                    pltpu.VMEM((b, d_pad), jnp.float32),
                    pltpu.VMEM((b, d_pad), jnp.float32),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((bhn, t_pad, d_pad), k.dtype),
                jax.ShapeDtypeStruct((bhn, t_pad, d_pad), v.dtype),
            ],
            interpret=interpret,
        )(*dkv_arrays)

        # --- d table: diagonal reduction in REVERSED-row space,
        # grid (H, 3*n_blk, B, nq); un-reverse at the end ---
        nb = n_blk
        n_tab = L // b

        def dspec_q(dim):
            return pl.BlockSpec(
                (1, b, dim),
                lambda h, rho, bi, qi, *_, H=n_heads: (bi * H + h, qi, 0),
            )

        def dspec_pair(off):
            # pair A (off=-1): ki = qi + nb - 1 - rho; pair B (off=0):
            # ki = qi + nb - rho
            def imap(h, rho, bi, qi, *_, H=n_heads, nb=nb, off=off):
                return (
                    bi * H + h,
                    jnp.clip(qi + nb + off - rho, 0, nb - 1),
                    0,
                )
            return pl.BlockSpec((1, b, d_pad), imap)

        def dspec_tab(off):
            # TRUE-table blocks for the score recompute: pair A's lo is
            # 3*nb - 2 - rho (off=0), shared mid 3*nb - 1 - rho (off=1),
            # pair B's hi 3*nb - rho (off=2)
            def imap(h, rho, bi, qi, *_, nt=n_tab, nb=nb, off=off):
                return (h, jnp.clip(3 * nb - 2 - rho + off, 0, nt - 1), 0)
            return pl.BlockSpec((1, b, qw), imap)

        dpos_in_specs = [
            dspec_q(d_pad), dspec_q(qw), dspec_q(d_pad), dspec_q(d_pad),
            dspec_q(128),
            dspec_pair(-1), dspec_pair(-1),  # pair A k, v
            dspec_pair(0), dspec_pair(0),  # pair B k, v
            dspec_tab(0), dspec_tab(1), dspec_tab(2),
        ]
        dtable_rev = pl.pallas_call(
            functools.partial(
                _rel_bwd_dpos_kernel, n_batch=n_batch, n_kv=nb, **kern
            ),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(n_heads, n_tab, n_batch, n_blk),
                in_specs=dpos_in_specs,
                out_specs=pl.BlockSpec((1, b, qw), lambda h, rho, bi, qi, *_: (h, rho, 0)),
                scratch_shapes=[pltpu.VMEM((b, qw), jnp.float32)],
            ),
            out_shape=jax.ShapeDtypeStruct((n_heads, L, qw), table.dtype),
            interpret=interpret,
        )(lens, seed, qu, qv, g, out, lse, k, v, k, v, table, table, table)
        return None, None, dqu, dqv, dk, dv, dtable_rev[:, ::-1, :]

    core.defvjp(core_fwd, core_bwd)
    return core


@functools.partial(
    jax.jit, static_argnames=("block", "interpret", "legacy", "dropout_rate")
)
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
    dropout_rate: float = 0.0,
    dropout_seed: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Flash attention with Transformer-XL relative position scores.

    Computes softmax((q_u k^T + rel_shift(q_v p^T)) / sqrt(D)) v blockwise:
    for each (q block, kv block) pair only the two aligned rel-table blocks
    covering relative distances (qi - ki)*b + (-b, b) are fetched, and the
    (b, 2b) band is skewed into the (b, b) score tile in-register — the
    full (T, 2T-1) rel-score matrix never materializes. Differentiable
    (custom VJP, see module docstring) with optional in-kernel dropout.

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
    reuses the same kernel at 2x the qv/pos feature width. The padding /
    table assembly below is plain differentiable XLA, so only the inner
    core needs the hand-written VJP.

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
        dropout_rate: attention-weight dropout probability.
        dropout_seed: (1,) int32 seed; required when dropout_rate > 0.
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
    if dropout_rate > 0.0 and dropout_seed is None:
        raise ValueError("dropout_rate > 0 requires dropout_seed")
    seed = (
        jnp.zeros((1,), jnp.int32)
        if dropout_seed is None
        else dropout_seed.reshape((1,)).astype(jnp.int32)
    )

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

    core = _rel_core(H, b, scale, float(dropout_rate), interpret)
    out = core(kv_lens, seed, qu, qv, kp, vp, table)
    return out.reshape(B, H, t_pad, d_pad)[:, :, :T, :D]

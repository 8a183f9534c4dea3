"""Fused relative-position attention SCORES (Pallas, new-style rel-pos).

The middle path between the dense XLA rel-pos attention and the full flash
kernel: compute ``scores = (q_u k^T + rel_shift(q_v p^T)) / sqrt(d)`` in one
blocked Pallas pass that skews each (b, 2b) band tile in-register — the
(B, H, T, 2T-1) ``matrix_bd`` of the dense path (reference
``modules/transformer/attention.py:237-260``) never materializes in HBM —
while still RETURNING the O(T^2) score matrix so XLA's fused
softmax/dropout/AV pipeline (and its stored-probabilities backward) is kept
as-is. Unlike the flash kernels there is no FA2 recompute in the backward,
so this wins exactly where flash loses: bandwidth-bound TRAINING at
moderate T, where the step pays for streaming the band tensor but not for
extra FLOPs (see CLAUDE.md round-3/4 measured facts).

Backward (custom VJP): ``dq_u``/``dk`` are plain XLA matmuls on the score
cotangent; the DEFAULT ``bwd='auto'`` length-gates between ``'xla'``
(below ``AUTO_BANDED_MIN_LEN``: rebuild the band cotangent once in XLA —
the inverse rel_shift — for the two table-side contractions; the dense
backward's traffic on the cotangent but still no forward-side band
tensor) and ``'banded'`` (at long T, where the ~T^2 band-cotangent
traffic dominates). ``bwd='pallas'`` instead reuses the flash kernels' reversed-band
machinery (``_block_rel_unshift_flipped``): ``dq_v`` via a blocked kernel
against the row-reversed table, ``dpos`` via the diagonal-reduction grid —
the (T, 2T-1) cotangent never materializes either, but MEASURED on the
chip it is catastrophic (2081 ms/step vs 78.2 for xla-bwd vs 82.0 dense at
the B16xT512 flagship: the dtab kernel's (H, n_tab, B, n_q) grid makes
n_tab*n_q passes with two guarded unshifts each and mostly-idle tiles).
Kept for long-context revisits; select with ``S2S_REL_SCORES_BWD``.

New-style rel-pos only (AASVC/FS2/TTS conformer stacks — the hot path);
the legacy style (VTN) keeps the dense implementation.
"""

from __future__ import annotations

import functools
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flash_attention import (
    _block_rel_unshift_flipped,
    _rel_scores,
    _round_up,
)

# bwd='auto' gate: the band-cotangent traffic the 'banded' backward avoids
# grows ~T^2, so it wins at long T (chip A/B, fused fwd both sides:
# 194.1 vs 206.9 ms/step at B16xT960) but is a wash at T=512 (76.7 vs
# 76.0) where the resident-accumulation kernel's lower achieved bandwidth
# cancels the saving. The crossover is INTERPOLATED within the measured
# bracket (xla wins at 512, banded at 960; the 768-959 band itself is
# unmeasured) — tune via S2S_REL_SCORES_AUTO_MIN_LEN if a shape in that
# band matters.
AUTO_BANDED_MIN_LEN = int(os.environ.get("S2S_REL_SCORES_AUTO_MIN_LEN", "768"))

# banded-backward length CAP (padded T). At t_pad >= 3072 the banded
# pallas_call compile-OOMs VMEM on the chip at small batch: XLA
# stack-allocates the custom call's output tuple (dqv + the reversed table
# gradient) in VMEM when no element is HBM-large, and at B2 the long-T
# tuple (observed: bf16[4,3072,256] + f32[2,6144,256] = 18.9 MB, and the
# same at T4096) exceeds what is left beside the kernel's scoped window
# ("Ran out of memory in memory space vmem while allocating on stack",
# long-context sweep r5). Per-call output sizes do NOT predict the failure
# (B2xT1024's decoder call has byte-identical outputs and runs fine), so
# the gate is the chip-measured length boundary: every observed OOM is at
# t_pad >= 3072, every working measurement at t_pad <= 2048 — and
# production never routes T >= 3072 here anyway (attention falls to the
# flash kernels at FLASH_MIN_LEN). Above the cap the backward falls back
# to the xla band-rebuild. Tune via S2S_REL_SCORES_BANDED_MAX_LEN.
BANDED_MAX_LEN = int(os.environ.get("S2S_REL_SCORES_BANDED_MAX_LEN", "3072"))


def _resolve_bwd(bwd: str, t: int, t_pad: int, interpret: bool) -> str:
    """Resolve the backward variant OUTSIDE the jit boundary (static key).

    'auto' length-gates on the raw T (the chip-measured xla/banded
    crossover); a resolved/explicit 'banded' is then capped at
    BANDED_MAX_LEN padded frames on real hardware (VMEM stack-placement
    OOM — see the constant's comment). Interpret mode (CPU tests) skips
    the cap so the kernel stays exercised at any length.
    """
    if bwd == "auto":
        bwd = "banded" if t >= AUTO_BANDED_MIN_LEN else "xla"
    if bwd == "banded" and not interpret and t_pad >= BANDED_MAX_LEN:
        bwd = "xla"
    return bwd


def _fwd_kernel(qu_ref, qv_ref, k_ref, plo_ref, phi_ref, s_ref, *, block, scale):
    s, _ = _rel_scores(
        qu_ref[0], qv_ref[0], k_ref[0], plo_ref[0], phi_ref[0],
        block=block, scale=scale,
    )
    s_ref[0] = s


def _dqv_kernel(g_ref, rlo_ref, rhi_ref, dqv_ref, dqv_scr, *, block, scale):
    ki = pl.program_id(2)
    n_kv = pl.num_programs(2)

    @pl.when(ki == 0)
    def _():
        dqv_scr[:] = jnp.zeros_like(dqv_scr)

    y = _block_rel_unshift_flipped(g_ref[0] * scale, block)  # (b, 2b) rev band
    p2_rev = jnp.concatenate([rlo_ref[0], rhi_ref[0]], axis=0)  # (2b, qw)
    dqv_scr[:] += jax.lax.dot_general(
        y, p2_rev, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(ki == n_kv - 1)
    def _():
        dqv_ref[0] = dqv_scr[:].astype(dqv_ref.dtype)


def _dtab_kernel(
    g_a_ref, g_b_ref, qv_ref, dtab_ref, acc_scr,
    *, block, scale, n_batch, n_kv,
):
    """Reversed-table gradient, reduced along band diagonals.

    Same output geometry as ``_rel_bwd_dpos_kernel`` (flash_attention.py)
    but the score cotangent ``g`` arrives precomputed instead of being
    recomputed from the softmax: rev-table block ``rho`` accumulates
    ``unshift(g)^T qv`` rows [0:b) from pair A (ki = qi + n_kv - 1 - rho)
    and rows [b:2b) from pair B (ki = qi + n_kv - rho).
    """
    rho = pl.program_id(1)
    bi = pl.program_id(2)
    qi = pl.program_id(3)
    n_q = pl.num_programs(3)

    @pl.when((bi == 0) & (qi == 0))
    def _():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    b = block
    ki_a = qi + n_kv - 1 - rho
    ki_b = qi + n_kv - rho

    @pl.when((ki_a >= 0) & (ki_a < n_kv))
    def _():
        y = _block_rel_unshift_flipped(g_a_ref[0] * scale, b)
        c = jax.lax.dot_general(
            y, qv_ref[0], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (2b, qw) rows in rev-table order
        acc_scr[:] += c[:b]

    @pl.when((ki_b >= 0) & (ki_b < n_kv))
    def _():
        y = _block_rel_unshift_flipped(g_b_ref[0] * scale, b)
        c = jax.lax.dot_general(
            y, qv_ref[0], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scr[:] += c[b:]

    @pl.when((bi == n_batch - 1) & (qi == n_q - 1))
    def _():
        dtab_ref[0] = acc_scr[:].astype(dtab_ref.dtype)


def _banded_bwd_kernel(
    g_ref, rlo_ref, rhi_ref, qv_ref, dqv_ref, dtab_ref, dqv_scr,
    *, block, scale, n_kv,
):
    """One pass over the score cotangent: dqv AND dtab from shared y.

    Fixes what made the diagonal-reduction ``_dtab_kernel`` catastrophic
    (2081 ms/step measured): its (H, n_tab, B, n_q) grid visits every
    (diagonal, batch, query) triple — mostly out-of-range guards — and
    unshifts each g block twice. Here the grid is the DENSE g tiling
    (h, bi, qi, ki): every cotangent block is loaded and unshifted exactly
    once, y serves both contractions, and the (2b, qw) table contribution
    is scatter-accumulated at dynamic row offset rho*b into the touched
    [0, 2*t_pad) prefix of the reversed-table gradient, which stays
    VMEM-resident for the whole grid (out index (h, 0, 0) — revisits are
    consecutive). The tile size here is the BACKWARD's own (picked by
    ``_pick_banded_block`` against the scoped-VMEM budget), independent of
    the forward's adaptive cap. Row mapping (inverse of ``_dtab_kernel``):
    g block (qi, ki) contributes c[:b] to rev block rho = qi + n_kv - 1 -
    ki and c[b:] to rho + 1 — contiguous rows [rho*b, rho*b + 2b), always
    within [0, 2 * n_kv * b).
    """
    bi = pl.program_id(1)
    qi = pl.program_id(2)
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _():
        dqv_scr[:] = jnp.zeros_like(dqv_scr)

    @pl.when((bi == 0) & (qi == 0) & (ki == 0))
    def _():
        dtab_ref[0] = jnp.zeros_like(dtab_ref[0])

    y = _block_rel_unshift_flipped(g_ref[0] * scale, block)  # (b, 2b)
    p2_rev = jnp.concatenate([rlo_ref[0], rhi_ref[0]], axis=0)  # (2b, qw)
    dqv_scr[:] += jax.lax.dot_general(
        y, p2_rev, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(ki == n_kv - 1)
    def _():
        dqv_ref[0] = dqv_scr[:].astype(dqv_ref.dtype)

    c = jax.lax.dot_general(
        y, qv_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (2b, qw) rows in rev-table order
    off = (qi + n_kv - 1 - ki) * block
    idx = (0, pl.ds(off, 2 * block), slice(None))
    dtab_ref[idx] += c


def _banded_vmem_estimate(b2: int, t_pad: int, qw: int, esz: int) -> int:
    """Conservative scoped-VMEM bytes for one _banded_bwd_kernel instance.

    Double-buffered ins/outs + the grid-resident (2*t_pad, qw) fp32 table
    gradient + the fp32 scratch + in-register temporaries (unshifted y,
    concat'd p2_rev, c). Used to pick the backward's own tile size: the
    forward's adaptive 512 cap blows the 16 MB scoped limit here at the
    decoder's 768-per-head width (measured: 17.12 M requested).
    """
    dtab = 2 * t_pad * qw * 4
    g_in = 2 * b2 * b2 * 4
    tab_in = 2 * 2 * b2 * qw * esz
    qv_in = 2 * b2 * qw * esz
    dqv_out = 2 * b2 * qw * esz
    scratch = b2 * qw * 4
    temps = 2 * b2 * 2 * b2 * 4 + 2 * 2 * b2 * qw * 4
    return dtab + g_in + tab_in + qv_in + dqv_out + scratch + temps


def _pick_banded_block(b: int, t_pad: int, qw: int, esz: int, limit: int):
    """Largest 128-multiple tile <= b dividing t_pad that fits the limit.

    The tile is the LAST dim of the kernel's (1, b2, b2) g block, and the
    Pallas TPU lowering requires last block dims to be multiples of 128
    (or equal to the array dim) — a sub-128 tile is a lowering error, not
    a slower kernel (observed: b2=64 at B2 x T2048, where the small
    batch*heads product let the VMEM budget press the tile below 128).

    None = no legal tile fits (table-grad residency dominates at large
    t_pad*qw) -> caller falls back to the xla backward.
    """
    cand = (b // 128) * 128
    while cand >= 128:
        if t_pad % cand == 0 and _banded_vmem_estimate(
            cand, t_pad, qw, esz
        ) <= limit:
            return cand
        cand -= 128
    return None


def _rel_unshift_xla(g: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Transpose of the new-style ``rel_shift``: (.., T, T) -> (.., T, 2T-1).

    Exactly the dense backward's band-cotangent reconstruction (the linear
    transpose of pad/reshape/slice), materialized once for the two
    table-side matmuls of the 'xla' backward variant.
    """
    *lead, t, _ = g.shape
    n = 2 * t - 1
    g2 = jnp.pad(g * scale, [(0, 0)] * len(lead) + [(0, 0), (0, n - t)])
    g2 = g2.reshape(*lead, n, t)
    g2 = jnp.pad(g2, [(0, 0)] * len(lead) + [(1, 0), (0, 0)])
    g2 = g2.reshape(*lead, t, n + 1)
    return g2[..., 1:]


@functools.lru_cache(maxsize=None)
def _scores_core(n_heads, block, scale, interpret, bwd, bwd_vmem_limit):
    b = block

    def fwd_impl(qu, qv, k, table):
        bhn, t_pad, d_pad = qu.shape
        qw = table.shape[-1]
        n_blk = t_pad // b
        grid = (bhn, n_blk, n_blk)
        return pl.pallas_call(
            functools.partial(_fwd_kernel, block=b, scale=scale),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, b, d_pad), lambda bh, qi, ki: (bh, qi, 0)),
                pl.BlockSpec((1, b, qw), lambda bh, qi, ki: (bh, qi, 0)),
                pl.BlockSpec((1, b, d_pad), lambda bh, qi, ki: (bh, ki, 0)),
                pl.BlockSpec(
                    (1, b, qw),
                    lambda bh, qi, ki, nb=n_blk, H=n_heads: (
                        bh % H, 2 * nb - qi + ki - 1, 0
                    ),
                ),
                pl.BlockSpec(
                    (1, b, qw),
                    lambda bh, qi, ki, nb=n_blk, H=n_heads: (
                        bh % H, 2 * nb - qi + ki, 0
                    ),
                ),
            ],
            out_specs=pl.BlockSpec((1, b, b), lambda bh, qi, ki: (bh, qi, ki)),
            out_shape=jax.ShapeDtypeStruct((bhn, t_pad, t_pad), jnp.float32),
            interpret=interpret,
        )(qu, qv, k, table, table)

    @jax.custom_vjp
    def core(qu, qv, k, table):
        return fwd_impl(qu, qv, k, table)

    def core_fwd(qu, qv, k, table):
        return fwd_impl(qu, qv, k, table), (qu, qv, k, table)

    def core_bwd(res, g):
        qu, qv, k, table = res
        bhn, t_pad, d_pad = qu.shape
        qw = table.shape[-1]
        n_blk = t_pad // b
        n_batch = bhn // n_heads
        n_tab = table.shape[1] // b
        g = g.astype(jnp.float32)

        # score-side grads: plain batched matmuls on g — XLA is optimal here
        dqu = (
            jax.lax.dot_general(
                g, k, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            * scale
        ).astype(qu.dtype)
        dk = (
            jax.lax.dot_general(
                g, qu, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            * scale
        ).astype(k.dtype)

        def xla_bwd():
            # rebuild the padded (t_pad, 2*t_pad - 1) band cotangent once
            # (the dense backward's traffic), then two table contractions.
            # Padded band column j <-> table row t_pad + j (derivation in
            # fused_rel_scores' table-layout comment).
            d_raw = _rel_unshift_xla(g, scale)  # (bhn, t_pad, 2*t_pad - 1)
            n = d_raw.shape[-1]
            tab_rows = jax.lax.dynamic_slice_in_dim(table, t_pad, n, axis=1)
            d_raw4 = d_raw.reshape(n_batch, n_heads, t_pad, n)
            dqv = jnp.einsum(
                "bhqn,hnw->bhqw", d_raw4, tab_rows,
                preferred_element_type=jnp.float32,
            ).reshape(bhn, t_pad, qw).astype(qv.dtype)
            dtab_rows = jnp.einsum(
                "bhqn,bhqw->hnw",
                d_raw4,
                qv.reshape(n_batch, n_heads, t_pad, qw),
                preferred_element_type=jnp.float32,
            )
            dtable = jnp.zeros_like(table)
            dtable = jax.lax.dynamic_update_slice(
                dtable, dtab_rows.astype(table.dtype), (0, t_pad, 0)
            )
            return dqu, dqv, dk, dtable

        if bwd == "xla":
            return xla_bwd()

        table_rev = table[:, ::-1, :]
        if bwd == "banded":
            # the backward picks its OWN tile: the grid-resident table-grad
            # block + 512-wide forward tiles exceed the 16 MB scoped-VMEM
            # limit at decoder widths (measured 17.12 M requested).
            b2 = _pick_banded_block(
                b, t_pad, qw, qv.dtype.itemsize, bwd_vmem_limit
            )
            if b2 is None:  # residency alone too big -> xla variant
                return xla_bwd()
            nb2 = t_pad // b2
            # only rev-table rows [0, 2*t_pad) are ever touched (max row
            # offset (2*nb2 - 2)*b2 + 2*b2 = 2*t_pad); rev rows
            # [2*t_pad, 3*t_pad) <-> original zero-padding rows [0, t_pad),
            # whose gradient is exactly zero — so the resident output block
            # carries 2*t_pad rows and the zeros are appended afterwards.
            dqv, dtab_rev = pl.pallas_call(
                functools.partial(
                    _banded_bwd_kernel, block=b2, scale=scale, n_kv=nb2
                ),
                grid=(n_heads, n_batch, nb2, nb2),
                in_specs=[
                    pl.BlockSpec(
                        (1, b2, b2),
                        lambda h, bi, qi, ki, H=n_heads: (bi * H + h, qi, ki),
                    ),
                    # reversed-table blocks (same geometry as _dqv_kernel)
                    pl.BlockSpec(
                        (1, b2, qw),
                        lambda h, bi, qi, ki, nb=nb2: (h, nb - 1 + qi - ki, 0),
                    ),
                    pl.BlockSpec(
                        (1, b2, qw),
                        lambda h, bi, qi, ki, nb=nb2: (h, nb + qi - ki, 0),
                    ),
                    pl.BlockSpec(
                        (1, b2, qw),
                        lambda h, bi, qi, ki, H=n_heads: (bi * H + h, qi, 0),
                    ),
                ],
                out_specs=(
                    pl.BlockSpec(
                        (1, b2, qw),
                        lambda h, bi, qi, ki, H=n_heads: (bi * H + h, qi, 0),
                    ),
                    pl.BlockSpec(
                        (1, 2 * t_pad, qw), lambda h, bi, qi, ki: (h, 0, 0)
                    ),
                ),
                out_shape=(
                    jax.ShapeDtypeStruct((bhn, t_pad, qw), qv.dtype),
                    jax.ShapeDtypeStruct(
                        (n_heads, 2 * t_pad, qw), jnp.float32
                    ),
                ),
                scratch_shapes=[pltpu.VMEM((b2, qw), jnp.float32)],
                interpret=interpret,
            )(g, table_rev, table_rev, qv)
            # orig = reverse(concat([dtab_rev, zeros(t_pad)]))
            #      = concat([zeros(t_pad), reverse(dtab_rev)])
            dtable = jnp.concatenate(
                [
                    jnp.zeros((n_heads, t_pad, qw), table.dtype),
                    dtab_rev[:, ::-1, :].astype(table.dtype),
                ],
                axis=1,
            )
            return dqu, dqv, dk, dtable
        dqv = pl.pallas_call(
            functools.partial(_dqv_kernel, block=b, scale=scale),
            grid=(bhn, n_blk, n_blk),
            in_specs=[
                pl.BlockSpec((1, b, b), lambda bh, qi, ki: (bh, qi, ki)),
                # reversed-table blocks: lo_rev = n_tab - 2 - lo
                pl.BlockSpec(
                    (1, b, qw),
                    lambda bh, qi, ki, nb=n_blk, H=n_heads: (
                        bh % H, nb - 1 + qi - ki, 0
                    ),
                ),
                pl.BlockSpec(
                    (1, b, qw),
                    lambda bh, qi, ki, nb=n_blk, H=n_heads: (
                        bh % H, nb + qi - ki, 0
                    ),
                ),
            ],
            out_specs=pl.BlockSpec((1, b, qw), lambda bh, qi, ki: (bh, qi, 0)),
            out_shape=jax.ShapeDtypeStruct((bhn, t_pad, qw), qv.dtype),
            scratch_shapes=[pltpu.VMEM((b, qw), jnp.float32)],
            interpret=interpret,
        )(g, table_rev, table_rev)

        def gspec(off):
            # g block for pair A (off=-1: ki = qi + nb - 1 - rho) / B
            # (off=0); out-of-range diagonals are clipped — the pl.when
            # guards in the kernel skip their contribution.
            def imap(h, rho, bi, qi, H=n_heads, nb=n_blk, off=off):
                return (
                    bi * H + h, qi, jnp.clip(qi + nb + off - rho, 0, nb - 1)
                )
            return pl.BlockSpec((1, b, b), imap)

        dtable_rev = pl.pallas_call(
            functools.partial(
                _dtab_kernel, block=b, scale=scale,
                n_batch=n_batch, n_kv=n_blk,
            ),
            grid=(n_heads, n_tab, n_batch, n_blk),
            in_specs=[
                gspec(-1),
                gspec(0),
                pl.BlockSpec(
                    (1, b, qw),
                    lambda h, rho, bi, qi, H=n_heads: (bi * H + h, qi, 0),
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, b, qw), lambda h, rho, bi, qi: (h, rho, 0)
            ),
            out_shape=jax.ShapeDtypeStruct(
                (n_heads, n_tab * b, qw), table.dtype
            ),
            scratch_shapes=[pltpu.VMEM((b, qw), jnp.float32)],
            interpret=interpret,
        )(g, g, qv)
        return dqu, dqv, dk, dtable_rev[:, ::-1, :]

    core.defvjp(core_fwd, core_bwd)
    return core


def fused_rel_scores(
    q_u: jnp.ndarray,
    q_v: jnp.ndarray,
    k: jnp.ndarray,
    pos: jnp.ndarray,
    block: int = 128,
    interpret: Optional[bool] = None,
    bwd: str = "auto",
    bwd_vmem_limit: Optional[int] = None,
) -> jnp.ndarray:
    """Scaled new-style rel-pos attention scores, band never materialized.

    Args:
        q_u, q_v: (B, H, T, D) queries with pos_bias_u / pos_bias_v added.
        k: (B, H, T, D) keys.
        pos: (H, 2T-1, D) head-split projected rel-pos table
            (RelPositionalEncoding row order: row p <-> distance T-1-p).
        block: tile size (T is padded up to a multiple).
        interpret: run in interpreter mode (None = auto: real kernel on
            TPU, interpreter elsewhere so tests run on CPU).
        bwd: 'xla' (rebuild the band cotangent once — the dense backward's
            traffic), 'banded' (one dense-grid Pallas pass computing dqv +
            dtab together, band cotangent never materialized, table grad
            scatter-accumulated in VMEM — see _banded_bwd_kernel),
            'auto' (length-gated best-of: the (T, 2T-1) band cotangent
            traffic grows ~T^2 so banded wins at long T — chip A/B:
            194.1 vs 206.9 ms/step at B16xT960 but a wash at T512
            (76.7 vs 76.0) — banded at T >= 768, xla below), or 'pallas'
            (the legacy diagonal-reduction pair — catastrophic on the
            chip, kept for A/B history). On real hardware a (resolved or
            explicit) 'banded' additionally falls back to 'xla' at
            t_pad >= BANDED_MAX_LEN (VMEM stack-placement compile OOM —
            see the constant's comment).
        bwd_vmem_limit: scoped-VMEM budget (bytes) the banded backward's
            tile picker targets (None = $S2S_REL_SCORES_BWD_VMEM, default
            14 MiB — headroom under the 16 MiB hardware scoped limit);
            shapes whose table-grad residency can't fit fall back to the
            xla backward.
    Returns:
        (B, H, T, T) fp32 scores, already scaled by 1/sqrt(D). Rows/cols
        beyond valid lengths are garbage — callers apply their padding
        mask before the softmax exactly as with the dense path.
    """
    # resolve env/global-dependent knobs OUTSIDE the jit boundary so the
    # resolved values are part of the static cache key — resolving 'auto'
    # inside the traced body would silently reuse a stale variant if
    # AUTO_BANDED_MIN_LEN (or the VMEM budget) changed after a trace for
    # the same shapes (advisor finding r4)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    # mirror the jit body's tile clamp/padding so the banded length cap
    # sees the padded T (the quantity the compile-time OOM depends on)
    t = q_u.shape[2]
    t_pad = _round_up(t, min(block, _round_up(t, 128)))
    bwd = _resolve_bwd(bwd, t, t_pad, interpret)
    if bwd_vmem_limit is None:
        bwd_vmem_limit = int(
            os.environ.get("S2S_REL_SCORES_BWD_VMEM", str(14 * 2**20))
        )
    return _fused_rel_scores_jit(
        q_u, q_v, k, pos,
        block=block, interpret=interpret, bwd=bwd,
        bwd_vmem_limit=bwd_vmem_limit,
    )


@functools.partial(
    jax.jit, static_argnames=("block", "interpret", "bwd", "bwd_vmem_limit")
)
def _fused_rel_scores_jit(q_u, q_v, k, pos, *, block, interpret, bwd, bwd_vmem_limit):
    B, H, T, D = q_u.shape
    scale = 1.0 / math.sqrt(D)

    # clamp the tile to the 128-rounded sequence length: a 512 tile on a
    # T=256 bucket would pad (and compute) 2x the frames for nothing
    b = min(block, _round_up(T, 128))
    d_pad = _round_up(D, 128)
    t_pad = _round_up(T, b)
    n_blk = t_pad // b

    def padq(x):
        return jnp.pad(
            x, ((0, 0), (0, 0), (0, t_pad - T), (0, d_pad - D))
        ).reshape(B * H, t_pad, d_pad)

    qu, qv, kp = padq(q_u), padq(q_v), padq(k)

    # Table layout (same as rel_flash_attention): row r <-> relative
    # distance d = 2*t_pad - 1 - r (descending), so pos row p (distance
    # T-1-p) lands at r = 2*t_pad - T + p. For q, k in the PADDED
    # coordinate space the band column j = k - q + t_pad - 1 of the padded
    # (t_pad, 2*t_pad - 1) product reads distance d = k - q at row
    # r = 2*t_pad - 1 - d = t_pad + j... i.e. padded band col j <-> table
    # row t_pad + j, which the 'xla' backward uses directly.
    L = 3 * n_blk * b
    table = jnp.zeros((H, L, d_pad), pos.dtype)
    table = jax.lax.dynamic_update_slice(
        table,
        jnp.pad(pos, ((0, 0), (0, 0), (0, d_pad - D))),
        (0, 2 * t_pad - T, 0),
    )

    core = _scores_core(H, b, scale, interpret, bwd, bwd_vmem_limit)
    s = core(qu, qv, kp, table)
    return s.reshape(B, H, t_pad, t_pad)[:, :, :T, :T]

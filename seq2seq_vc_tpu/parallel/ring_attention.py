"""Ring attention: sequence-parallel attention over a device mesh.

TPU-native extension beyond the reference's capabilities (SURVEY.md §2.10
lists sequence/context parallelism as "NO explicit impl" upstream — long
sequences are handled only by reduction factors). Here the time axis is
sharded over a mesh axis and exact attention is computed by rotating K/V
shards around the ring with ``jax.lax.ppermute`` (ICI neighbor exchange)
while each device folds the incoming block into a running online-softmax
state (max, normalizer, accumulator) — the same streaming-softmax algebra
as the Pallas flash kernel in ``ops/flash_attention.py``, lifted one level
up to the mesh. Peak per-device memory is O(T/P * T/P) per block instead
of O(T^2), and the compute/communication pattern overlaps naturally: XLA
schedules each ppermute concurrently with the previous block's matmuls.

Differentiable by construction (``lax.scan`` + collective transposition is
handled by JAX autodiff), so it works for long-context TRAINING where even
the single-chip flash kernel runs out of HBM.

Used via ``shard_map`` over a mesh with a sequence axis, e.g.::

    mesh = Mesh(mesh_utils.create_device_mesh((P,)), ("sp",))
    out = jax.jit(shard_map(
        functools.partial(ring_attention, axis_name="sp"),
        mesh=mesh,
        in_specs=(Pspec(None, None, "sp", None),) * 3 + (Pspec(),),
        out_specs=Pspec(None, None, "sp", None),
    ))(q, k, v, kv_lens)
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_lens: Optional[jnp.ndarray] = None,
    axis_name: str = "sp",
    causal: bool = False,
) -> jnp.ndarray:
    """Exact masked attention with the time axis sharded on ``axis_name``.

    Runs INSIDE ``shard_map``: every array argument is the local shard.

    Args:
        q: (B, H, T_local, D) local query shard (device i holds global
            positions [i*T_local, (i+1)*T_local)).
        k, v: (B, H, T_local, D) local key/value shards, same layout.
        kv_lens: (B,) GLOBAL valid key lengths (replicated).
        axis_name: mesh axis carrying the sequence shards.
        causal: standard causal masking in global positions.

    Returns:
        (B, H, T_local, D) local output shard.
    """
    n_dev = jax.lax.psum(1, axis_name)
    my_idx = jax.lax.axis_index(axis_name)
    B, H, t_loc, D = q.shape
    scale = 1.0 / math.sqrt(D)
    q_pos = my_idx * t_loc + jnp.arange(t_loc)  # global query positions

    def fold(state, k_blk, v_blk, src):
        """Fold one K/V block into the online-softmax state."""
        m, l, acc = state
        kv_pos = src * t_loc + jnp.arange(t_loc)  # global key positions

        s = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k_blk, preferred_element_type=jnp.float32
        ) * scale
        valid = jnp.ones((B, 1, t_loc, t_loc), bool)
        if kv_lens is not None:
            valid = valid & (kv_pos[None, :] < kv_lens[:, None])[:, None, None, :]
        if causal:
            valid = valid & (kv_pos[None, :] <= q_pos[:, None])[None, None, :, :]
        s = jnp.where(valid, s, _NEG_INF)

        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m, m_cur)
        alpha = jnp.exp(m - m_new)
        p = jnp.where(valid, jnp.exp(s - m_new), 0.0)
        l_new = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        pv = jnp.einsum(
            "bhqk,bhkd->bhqd", p.astype(v_blk.dtype), v_blk,
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc * alpha + pv

    def step(carry, _):
        state, kv, src = carry
        # rotate FIRST: the local block is folded before the scan, so every
        # iteration folds exactly one incoming block and no rotation result
        # is ever discarded (a rotate-last loop wastes one full K/V
        # exchange over ICI on its final iteration). The block that started
        # on device j sits on device (j + step) after `step` rotations, so
        # the incoming block's source index decrements (mod n_dev).
        perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        k_blk, v_blk = jax.lax.ppermute(kv, axis_name, perm)
        src = (src - 1) % n_dev
        return (fold(state, k_blk, v_blk, src), (k_blk, v_blk), src), None

    m0 = jnp.full((B, H, t_loc, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((B, H, t_loc, 1), jnp.float32)
    acc0 = jnp.zeros((B, H, t_loc, D), jnp.float32)
    state = fold((m0, l0, acc0), k, v, my_idx)
    ((m, l, acc), _, _), _ = jax.lax.scan(
        step, (state, (k, v), my_idx), None, length=n_dev - 1
    )
    out = acc / jnp.where(l == 0.0, 1.0, l)
    return out.astype(q.dtype)


def ring_rel_attention(
    q_u: jnp.ndarray,
    q_v: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    p: jnp.ndarray,
    kv_lens: Optional[jnp.ndarray] = None,
    axis_name: str = "seq",
    dropout_rate: float = 0.0,
    dropout_seed: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Ring attention with NEW-style Transformer-XL relative position bias
    (the conformer stacks' attention — ``nn/attention.py``
    ``RelPositionMultiHeadedAttention``). Runs INSIDE ``shard_map``.

    The position-score matrix ``bd_full = (q + pos_bias_v) @ p^T`` over all
    2T-1 relative offsets is computed ONCE per device for the local queries
    (same FLOPs as the dense path's matrix_bd), then each incoming K/V
    block gathers its columns by global relative offset
    ``k_pos - q_pos + T - 1`` — exactly the dense path's rel-shift
    semantics (``out[q, k] = bd[q, k - q + T - 1]``), verified against it
    in ``tests/test_sequence_parallel.py``.

    Args:
        q_u: (B, H, T_local, D) queries + pos_bias_u (content scores).
        q_v: (B, H, T_local, D) queries + pos_bias_v (position scores).
        k, v: (B, H, T_local, D) local key/value shards.
        p: (H, 2*T_global - 1, D) projected positional embeddings
            (replicated; head-split ``linear_pos`` output).
        kv_lens: (B,) global valid key lengths (replicated).
        dropout_rate/dropout_seed: optional attention dropout on the
            unnormalized softmax numerator — the normalizer excludes the
            mask, which reproduces torch's dropout-on-weights semantics
            (w = p/l with l dropout-free).
    """
    n_dev = jax.lax.psum(1, axis_name)
    my_idx = jax.lax.axis_index(axis_name)
    B, H, t_loc, D = q_u.shape
    t_glob = t_loc * n_dev
    scale = 1.0 / math.sqrt(D)
    q_pos = my_idx * t_loc + jnp.arange(t_loc)

    bd_full = jnp.einsum(
        "bhqd,hpd->bhqp", q_v, p, preferred_element_type=jnp.float32
    )  # (B, H, t_loc, 2T-1)

    if dropout_rate > 0.0:
        base_key = jax.random.fold_in(
            jax.random.PRNGKey(dropout_seed[0].astype(jnp.uint32)), my_idx
        )
    keep_p = 1.0 - dropout_rate

    def fold(state, k_blk, v_blk, src):
        m, l, acc = state
        kv_pos = src * t_loc + jnp.arange(t_loc)

        ac = jnp.einsum(
            "bhqd,bhkd->bhqk", q_u, k_blk, preferred_element_type=jnp.float32
        )
        idx = kv_pos[None, :] - q_pos[:, None] + (t_glob - 1)  # (t_loc, t_loc)
        bd = jnp.take_along_axis(
            bd_full, jnp.broadcast_to(idx, (B, H, t_loc, t_loc)), axis=-1
        )
        s = (ac + bd) * scale
        valid = jnp.ones((B, 1, t_loc, t_loc), bool)
        if kv_lens is not None:
            valid = valid & (kv_pos[None, :] < kv_lens[:, None])[:, None, None, :]
        s = jnp.where(valid, s, _NEG_INF)

        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m, m_cur)
        alpha = jnp.exp(m - m_new)
        pexp = jnp.where(valid, jnp.exp(s - m_new), 0.0)
        l_new = alpha * l + jnp.sum(pexp, axis=-1, keepdims=True)
        if dropout_rate > 0.0:
            keep = jax.random.bernoulli(
                jax.random.fold_in(base_key, src), keep_p, pexp.shape
            )
            pexp_acc = jnp.where(keep, pexp / keep_p, 0.0)
        else:
            pexp_acc = pexp
        pv = jnp.einsum(
            "bhqk,bhkd->bhqd", pexp_acc.astype(v_blk.dtype), v_blk,
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc * alpha + pv

    def step(carry, _):
        state, kv, src = carry
        perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        k_blk, v_blk = jax.lax.ppermute(kv, axis_name, perm)
        src = (src - 1) % n_dev
        return (fold(state, k_blk, v_blk, src), (k_blk, v_blk), src), None

    m0 = jnp.full((B, H, t_loc, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((B, H, t_loc, 1), jnp.float32)
    acc0 = jnp.zeros((B, H, t_loc, D), jnp.float32)
    state = fold((m0, l0, acc0), k, v, my_idx)
    ((m, l, acc), _, _), _ = jax.lax.scan(
        step, (state, (k, v), my_idx), None, length=n_dev - 1
    )
    out = acc / jnp.where(l == 0.0, 1.0, l)
    return out.astype(q_u.dtype)

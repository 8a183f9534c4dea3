"""Attention compute core.

``scaled_dot_attention`` is the portable XLA path (fuses well on TPU for
the moderate sequence lengths of mel VC); the Pallas flash-attention kernel
in ``ops/flash_attention.py`` takes over for long sequences. Semantics
match reference ``modules/transformer/attention.py:15-111``: masked scores
get a large negative fill before softmax and exact zeros after, and the
softmax map can be returned for guided-attention losses / diagnostics
(the reference stores it as a module attribute side channel; here it is an
explicit output).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_MASK_FILL = -1e9


def scaled_dot_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    return_weights: bool = False,
):
    """Multi-head scaled dot-product attention.

    Args:
        q: (B, H, Tq, Dh) queries.
        k: (B, H, Tk, Dh) keys.
        v: (B, H, Tk, Dh) values.
        mask: optional bool, broadcastable to (B, H, Tq, Tk); True = attend.
        bias: optional additive score bias (e.g. relative position),
            broadcastable to (B, H, Tq, Tk).
    Returns:
        (B, H, Tq, Dh) context, and the (B, H, Tq, Tk) attention weights if
        ``return_weights``.
    """
    d = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores / jnp.sqrt(jnp.asarray(d, scores.dtype))
    if bias is not None:
        scores = scores + bias
    if mask is not None:
        scores = jnp.where(mask, scores, _MASK_FILL)
    attn = jax.nn.softmax(scores, axis=-1)
    if mask is not None:
        attn = jnp.where(mask, attn, 0.0)
    # AV matmul in v's dtype (bf16 under mixed precision) with fp32 MXU
    # accumulation; the fp32 attention map is still returned for losses.
    out = jnp.einsum(
        "bhqk,bhkd->bhqd",
        attn.astype(v.dtype),
        v,
        preferred_element_type=jnp.float32,
    ).astype(v.dtype)
    if return_weights:
        return out, attn
    return out

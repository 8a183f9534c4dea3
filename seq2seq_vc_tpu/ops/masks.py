"""Padding and causal masks.

Same semantics as reference ``layers/utils.py:4,124`` (``make_pad_mask`` is
True at padded positions) and ``modules/transformer/mask.py:262-278``
(``subsequent_mask`` is True at allowed positions). Pure jnp; everything is
fixed-shape so the masks fold into fused attention kernels.
"""

from __future__ import annotations

import jax.numpy as jnp


def make_pad_mask(lengths: jnp.ndarray, maxlen: int) -> jnp.ndarray:
    """(B, maxlen) bool mask, True where position >= length (i.e. padding)."""
    pos = jnp.arange(maxlen)[None, :]
    return pos >= lengths[:, None]


def make_non_pad_mask(lengths: jnp.ndarray, maxlen: int) -> jnp.ndarray:
    """(B, maxlen) bool mask, True at valid (non-pad) positions."""
    return ~make_pad_mask(lengths, maxlen)


def subsequent_mask(size: int) -> jnp.ndarray:
    """(size, size) bool causal mask, True where attention is allowed."""
    return jnp.tril(jnp.ones((size, size), dtype=bool))


def target_mask(olens: jnp.ndarray, maxlen: int) -> jnp.ndarray:
    """(B, maxlen, maxlen) decoder self-attention mask: causal AND key
    non-pad. Query rows are NOT masked — exactly the reference formula
    (``models/vtn.py:574-602``): padded query rows still attend the valid
    prefix, so the postnet's conv taps over the padded tail see the same
    values in both frameworks (numerical-parity requirement)."""
    non_pad = make_non_pad_mask(olens, maxlen)  # (B, T)
    causal = subsequent_mask(maxlen)[None]  # (1, T, T)
    return non_pad[:, None, :] & causal

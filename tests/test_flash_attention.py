"""Flash attention vs reference XLA attention (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from seq2seq_vc_tpu.ops import make_non_pad_mask, scaled_dot_attention
from seq2seq_vc_tpu.ops.flash_attention import flash_attention


def _ref(q, k, v, kv_lens=None, causal=False):
    mask = None
    B, H, Tq, D = q.shape
    Tk = k.shape[2]
    if kv_lens is not None:
        mask = np.asarray(make_non_pad_mask(jnp.asarray(kv_lens), Tk))[:, None, None, :]
        mask = np.broadcast_to(mask, (B, 1, Tq, Tk)).copy()
    if causal:
        cm = np.tril(np.ones((Tq, Tk), bool))[None, None]
        mask = cm if mask is None else (mask & cm)
    out = scaled_dot_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        mask=None if mask is None else jnp.asarray(mask),
    )
    return np.asarray(out)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("shape", [(2, 2, 64, 32), (1, 4, 200, 96)])
def test_flash_matches_reference(shape, causal):
    rng = np.random.default_rng(0)
    B, H, T, D = shape
    q = rng.standard_normal((B, H, T, D)).astype(np.float32)
    k = rng.standard_normal((B, H, T, D)).astype(np.float32)
    v = rng.standard_normal((B, H, T, D)).astype(np.float32)
    kv_lens = np.linspace(T // 2, T, B).astype(np.int32)

    got = np.asarray(
        flash_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            kv_lens=jnp.asarray(kv_lens), causal=causal,
            block_q=64, block_kv=64, interpret=True,
        )
    )
    want = _ref(q, k, v, kv_lens=kv_lens, causal=causal)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_flash_no_mask():
    rng = np.random.default_rng(1)
    q = rng.standard_normal((1, 2, 96, 64)).astype(np.float32)
    k = rng.standard_normal((1, 2, 80, 64)).astype(np.float32)
    v = rng.standard_normal((1, 2, 80, 64)).astype(np.float32)
    got = np.asarray(
        flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                        block_q=32, block_kv=32, interpret=True)
    )
    want = _ref(q, k, v)
    np.testing.assert_allclose(got, want, atol=2e-5)


def _rel_ref(q_u, q_v, k, v, pos, kv_lens):
    """XLA reference: (q_u k^T + rel_shift(q_v p^T)) masked softmax @ v."""
    import jax

    from seq2seq_vc_tpu.nn.attention import rel_shift

    B, H, T, D = q_u.shape
    ac = jnp.einsum("bhqd,bhkd->bhqk", q_u, k)
    bd = jnp.einsum("bhqd,hpd->bhqp", q_v, pos)
    bd = rel_shift(bd)
    s = (ac + bd) / np.sqrt(D)
    mask = np.arange(T)[None, :] < np.asarray(kv_lens)[:, None]
    s = jnp.where(jnp.asarray(mask)[:, None, None, :], s, -1e9)
    w = jax.nn.softmax(s, axis=-1)
    w = jnp.where(jnp.asarray(mask)[:, None, None, :], w, 0.0)
    return np.asarray(jnp.einsum("bhqk,bhkd->bhqd", w, v))


@pytest.mark.parametrize("shape", [(2, 2, 64, 32), (1, 2, 100, 48)])
def test_rel_flash_matches_reference(shape):
    from seq2seq_vc_tpu.ops.flash_attention import rel_flash_attention

    rng = np.random.default_rng(7)
    B, H, T, D = shape
    q_u = rng.standard_normal((B, H, T, D)).astype(np.float32)
    q_v = rng.standard_normal((B, H, T, D)).astype(np.float32)
    k = rng.standard_normal((B, H, T, D)).astype(np.float32)
    v = rng.standard_normal((B, H, T, D)).astype(np.float32)
    pos = rng.standard_normal((H, 2 * T - 1, D)).astype(np.float32)
    kv_lens = np.linspace(T // 2, T, B).astype(np.int32)

    got = np.asarray(
        rel_flash_attention(
            jnp.asarray(q_u), jnp.asarray(q_v), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(pos), kv_lens=jnp.asarray(kv_lens),
            block=32, interpret=True,
        )
    )
    want = _rel_ref(
        jnp.asarray(q_u), jnp.asarray(q_v), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(pos), kv_lens,
    )
    np.testing.assert_allclose(got, want, atol=3e-5)

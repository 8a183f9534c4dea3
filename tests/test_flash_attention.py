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


def _legacy_rel_ref(q_u, q_v, k, v, pos, kv_lens):
    """XLA reference for the LEGACY path: pos has T rows and the view-based
    rel_shift (reference attention.py:142-163) wraps next-row values into
    the j > i band — the flash kernel must reproduce that exactly."""
    import jax

    from seq2seq_vc_tpu.nn.attention import rel_shift

    B, H, T, D = q_u.shape
    ac = jnp.einsum("bhqd,bhkd->bhqk", q_u, k)
    bd = jnp.einsum("bhqd,hpd->bhqp", q_v, pos)
    bd = rel_shift(bd, legacy=True)
    s = (ac + bd) / np.sqrt(D)
    mask = np.arange(T)[None, :] < np.asarray(kv_lens)[:, None]
    s = jnp.where(jnp.asarray(mask)[:, None, None, :], s, -1e9)
    w = jax.nn.softmax(s, axis=-1)
    w = jnp.where(jnp.asarray(mask)[:, None, None, :], w, 0.0)
    return np.asarray(jnp.einsum("bhqk,bhkd->bhqd", w, v))


@pytest.mark.parametrize("shape", [(2, 2, 64, 32), (1, 2, 100, 48), (2, 2, 96, 32)])
def test_legacy_rel_flash_matches_reference(shape):
    from seq2seq_vc_tpu.ops.flash_attention import rel_flash_attention

    rng = np.random.default_rng(11)
    B, H, T, D = shape
    q_u = rng.standard_normal((B, H, T, D)).astype(np.float32)
    q_v = rng.standard_normal((B, H, T, D)).astype(np.float32)
    k = rng.standard_normal((B, H, T, D)).astype(np.float32)
    v = rng.standard_normal((B, H, T, D)).astype(np.float32)
    pos = rng.standard_normal((H, T, D)).astype(np.float32)
    kv_lens = np.linspace(T // 2, T, B).astype(np.int32)

    got = np.asarray(
        rel_flash_attention(
            jnp.asarray(q_u), jnp.asarray(q_v), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(pos), kv_lens=jnp.asarray(kv_lens),
            block=32, interpret=True, legacy=True,
        )
    )
    want = _legacy_rel_ref(
        jnp.asarray(q_u), jnp.asarray(q_v), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(pos), kv_lens,
    )
    # compare only valid query rows (padded-query rows are sliced identically
    # but the XLA path computes them against wrapped garbage too)
    np.testing.assert_allclose(got, want, atol=3e-5)


def test_legacy_rel_flash_module_parity():
    """LegacyRelPositionMultiHeadedAttention: flash vs xla backend."""
    import jax

    from seq2seq_vc_tpu.nn.attention import LegacyRelPositionMultiHeadedAttention

    rng = np.random.default_rng(3)
    B, T, F, Hh = 2, 48, 64, 2
    x = rng.standard_normal((B, T, F)).astype(np.float32)
    pos = rng.standard_normal((1, T, F)).astype(np.float32)
    mask = np.arange(T)[None, :] < np.asarray([T, T - 9])[:, None]

    m_x = LegacyRelPositionMultiHeadedAttention(Hh, F, 0.0, backend="xla")
    m_f = LegacyRelPositionMultiHeadedAttention(Hh, F, 0.0, backend="flash")
    params = m_x.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(x), jnp.asarray(x),
        jnp.asarray(pos), jnp.asarray(mask),
    )
    ox = m_x.apply(params, jnp.asarray(x), jnp.asarray(x), jnp.asarray(x),
                   jnp.asarray(pos), jnp.asarray(mask))
    of = m_f.apply(params, jnp.asarray(x), jnp.asarray(x), jnp.asarray(x),
                   jnp.asarray(pos), jnp.asarray(mask))
    valid = np.asarray(mask)
    np.testing.assert_allclose(
        np.asarray(of)[valid], np.asarray(ox)[valid], atol=5e-5
    )

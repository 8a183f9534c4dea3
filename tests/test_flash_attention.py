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
    m_f = LegacyRelPositionMultiHeadedAttention(
        Hh, F, 0.0, backend="flash", flash_train_min_len=0
    )
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


# ---------------------------------------------------------------------------
# backward pass (custom VJP) and in-kernel dropout
# ---------------------------------------------------------------------------


def _loss_weights(rng, shape, lens):
    """Random cotangent, zeroed on padded query rows."""
    B, H, T, D = shape
    w = rng.standard_normal(shape).astype(np.float32)
    w *= (np.arange(T)[None, :] < np.asarray(lens)[:, None])[:, None, :, None]
    return jnp.asarray(w)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_grads_match_xla(causal):
    """custom-VJP backward vs autodiff through the dense path."""
    import jax

    rng = np.random.default_rng(21)
    B, H, T, D = 2, 2, 48, 32
    q, k, v = (jnp.asarray(rng.standard_normal((B, H, T, D)).astype(np.float32))
               for _ in range(3))
    lens = np.array([48, 31], np.int32)
    wm = _loss_weights(rng, (B, H, T, D), lens)

    def dense(q, k, v):
        mask = (jnp.arange(T)[None, :] < jnp.asarray(lens)[:, None])[:, None, None, :]
        if causal:
            mask = mask & (jnp.arange(T)[None, None, :, None]
                           >= jnp.arange(T)[None, None, None, :])
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(D)
        s = jnp.where(mask, s, -1e30)
        p = jax.nn.softmax(s, -1)
        p = jnp.where(mask, p, 0.0)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v)

    g_flash = jax.grad(
        lambda q, k, v: (flash_attention(
            q, k, v, kv_lens=jnp.asarray(lens), causal=causal,
            block_q=16, block_kv=16, interpret=True) * wm).sum(),
        argnums=(0, 1, 2),
    )(q, k, v)
    g_dense = jax.grad(
        lambda q, k, v: (dense(q, k, v) * wm).sum(), argnums=(0, 1, 2)
    )(q, k, v)
    for a, b in zip(g_flash, g_dense):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_flash_dropout_matches_oracle():
    """In-kernel dropout == dense attention masked with the hash oracle
    (same seed), for both the forward value and all input grads."""
    import jax

    from seq2seq_vc_tpu.ops.flash_attention import dense_dropout_keep

    rng = np.random.default_rng(5)
    B, H, T, D, rate = 2, 2, 32, 16, 0.3
    q, k, v = (jnp.asarray(rng.standard_normal((B, H, T, D)).astype(np.float32))
               for _ in range(3))
    lens = np.array([32, 23], np.int32)
    seed = jnp.asarray([1234], jnp.int32)
    keep = dense_dropout_keep(1234, B * H, T, T, rate).reshape(B, H, T, T)
    wm = _loss_weights(rng, (B, H, T, D), lens)

    def dense(q, k, v):
        mask = (jnp.arange(T)[None, :] < jnp.asarray(lens)[:, None])[:, None, None, :]
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(D)
        s = jnp.where(mask, s, -1e30)
        import jax as _jax
        p = _jax.nn.softmax(s, -1)
        p = jnp.where(mask, p, 0.0)
        p = jnp.where(keep, p / (1 - rate), 0.0)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v)

    def flash(q, k, v):
        return flash_attention(
            q, k, v, kv_lens=jnp.asarray(lens), block_q=32, block_kv=32,
            interpret=True, dropout_rate=rate, dropout_seed=seed,
        )

    np.testing.assert_allclose(
        np.asarray(flash(q, k, v)), np.asarray(dense(q, k, v)), atol=2e-5
    )
    g1 = jax.grad(lambda *a: (flash(*a) * wm).sum(), argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda *a: (dense(*a) * wm).sum(), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_flash_dropout_deterministic_per_seed():
    rng = np.random.default_rng(6)
    B, H, T, D = 1, 2, 32, 16
    q, k, v = (jnp.asarray(rng.standard_normal((B, H, T, D)).astype(np.float32))
               for _ in range(3))
    kw = dict(block_q=32, block_kv=32, interpret=True, dropout_rate=0.5)
    o1 = flash_attention(q, k, v, dropout_seed=jnp.asarray([7], jnp.int32), **kw)
    o2 = flash_attention(q, k, v, dropout_seed=jnp.asarray([7], jnp.int32), **kw)
    o3 = flash_attention(q, k, v, dropout_seed=jnp.asarray([8], jnp.int32), **kw)
    assert np.array_equal(np.asarray(o1), np.asarray(o2))
    assert np.abs(np.asarray(o1) - np.asarray(o3)).max() > 1e-3


@pytest.mark.parametrize("legacy", [False, True])
def test_rel_flash_grads_match_xla(legacy):
    """Rel-pos custom VJP (incl. the diagonal-reduced table grad) vs dense."""
    import jax

    from seq2seq_vc_tpu.nn.attention import rel_shift
    from seq2seq_vc_tpu.ops.flash_attention import rel_flash_attention

    rng = np.random.default_rng(31)
    B, H, T, D = 2, 2, 40, 16  # T not a block multiple: exercises padding
    qu, qv, k, v = (jnp.asarray(rng.standard_normal((B, H, T, D)).astype(np.float32))
                    for _ in range(4))
    npos = T if legacy else 2 * T - 1
    pos = jnp.asarray(rng.standard_normal((H, npos, D)).astype(np.float32))
    lens = np.array([40, 27], np.int32)
    wm = _loss_weights(rng, (B, H, T, D), lens)

    def dense(qu, qv, k, v, pos):
        ac = jnp.einsum("bhqd,bhkd->bhqk", qu, k)
        bd = rel_shift(jnp.einsum("bhqd,hpd->bhqp", qv, pos), legacy=legacy)
        s = (ac + bd) / np.sqrt(D)
        mask = (jnp.arange(T)[None, :] < jnp.asarray(lens)[:, None])[:, None, None, :]
        s = jnp.where(mask, s, -1e30)
        p = jax.nn.softmax(s, -1)
        p = jnp.where(mask, p, 0.0)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v)

    g1 = jax.grad(
        lambda *a: (rel_flash_attention(
            *a, kv_lens=jnp.asarray(lens), block=16, interpret=True,
            legacy=legacy) * wm).sum(),
        argnums=(0, 1, 2, 3, 4),
    )(qu, qv, k, v, pos)
    g2 = jax.grad(
        lambda *a: (dense(*a) * wm).sum(), argnums=(0, 1, 2, 3, 4)
    )(qu, qv, k, v, pos)
    for a, b, name in zip(g1, g2, ["qu", "qv", "k", "v", "pos"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-4, err_msg=f"d{name}"
        )


@pytest.mark.parametrize("legacy", [False, True])
def test_rel_flash_dropout_grads_match_oracle(legacy):
    import jax

    from seq2seq_vc_tpu.nn.attention import rel_shift
    from seq2seq_vc_tpu.ops.flash_attention import (
        dense_dropout_keep, rel_flash_attention)

    rng = np.random.default_rng(41)
    B, H, T, D, rate = 2, 2, 32, 16, 0.2
    qu, qv, k, v = (jnp.asarray(rng.standard_normal((B, H, T, D)).astype(np.float32))
                    for _ in range(4))
    npos = T if legacy else 2 * T - 1
    pos = jnp.asarray(rng.standard_normal((H, npos, D)).astype(np.float32))
    lens = np.array([32, 25], np.int32)
    seed = jnp.asarray([77], jnp.int32)
    keep = dense_dropout_keep(77, B * H, T, T, rate).reshape(B, H, T, T)
    wm = _loss_weights(rng, (B, H, T, D), lens)

    def dense(qu, qv, k, v, pos):
        ac = jnp.einsum("bhqd,bhkd->bhqk", qu, k)
        bd = rel_shift(jnp.einsum("bhqd,hpd->bhqp", qv, pos), legacy=legacy)
        s = (ac + bd) / np.sqrt(D)
        mask = (jnp.arange(T)[None, :] < jnp.asarray(lens)[:, None])[:, None, None, :]
        s = jnp.where(mask, s, -1e30)
        p = jax.nn.softmax(s, -1)
        p = jnp.where(mask, p, 0.0)
        p = jnp.where(keep, p / (1 - rate), 0.0)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v)

    def flash(qu, qv, k, v, pos):
        return rel_flash_attention(
            qu, qv, k, v, pos, kv_lens=jnp.asarray(lens), block=32,
            interpret=True, legacy=legacy, dropout_rate=rate,
            dropout_seed=seed,
        )

    np.testing.assert_allclose(
        np.asarray(flash(qu, qv, k, v, pos) * wm),
        np.asarray(dense(qu, qv, k, v, pos) * wm),
        atol=2e-5,
    )
    g1 = jax.grad(lambda *a: (flash(*a) * wm).sum(), argnums=(0, 1, 2, 3, 4))(
        qu, qv, k, v, pos)
    g2 = jax.grad(lambda *a: (dense(*a) * wm).sum(), argnums=(0, 1, 2, 3, 4))(
        qu, qv, k, v, pos)
    for a, b, name in zip(g1, g2, ["qu", "qv", "k", "v", "pos"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-4, err_msg=f"d{name}"
        )


def test_rel_attention_module_trains_with_flash_dropout():
    """Module-level: flash backend + attention dropout 0.2 takes grads."""
    import jax

    from seq2seq_vc_tpu.nn.attention import RelPositionMultiHeadedAttention

    rng = np.random.default_rng(8)
    B, T, F, Hh = 2, 32, 32, 2
    x = jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32))
    pos = jnp.asarray(rng.standard_normal((1, 2 * T - 1, F)).astype(np.float32))
    mask = jnp.asarray(np.arange(T)[None, :] < np.array([T, T - 9])[:, None])

    mod = RelPositionMultiHeadedAttention(Hh, F, 0.2, backend="flash", flash_train_min_len=0)
    params = mod.init(jax.random.PRNGKey(0), x, x, x, pos, mask)

    def loss(p, key):
        out = mod.apply(
            p, x, x, x, pos, mask, deterministic=False,
            rngs={"dropout": key},
        )
        return (out ** 2).sum()

    l1, g = jax.value_and_grad(loss)(params, jax.random.PRNGKey(1))
    assert np.isfinite(float(l1))
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(t)).all() for t in flat)
    # same rng -> identical loss; different rng -> different dropout mask
    l2 = loss(params, jax.random.PRNGKey(1))
    l3 = loss(params, jax.random.PRNGKey(2))
    assert float(l1) == float(l2)
    assert float(l1) != float(l3)

"""Fused rel-pos scores kernel (ops/rel_scores.py) vs the dense path.

The fused path must compute the exact dense new-style rel-pos scores
(reference ``modules/transformer/attention.py:209-260`` semantics, already
parity-proven for the dense implementation in test_reference_parity.py)
and their gradients, for both backward variants, including non-block-
aligned T and the bound module with a padding mask.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seq2seq_vc_tpu.nn.attention import (
    RelPositionMultiHeadedAttention,
    rel_shift,
)
from seq2seq_vc_tpu.nn.positional_encoding import RelPositionalEncoding
from seq2seq_vc_tpu.ops.rel_scores import fused_rel_scores


def _dense_scores(qu, qv, k, pos):
    d = qu.shape[-1]
    ac = jnp.einsum("bhqd,bhkd->bhqk", qu, k)
    bd = rel_shift(jnp.einsum("bhqd,hpd->bhqp", qv, pos))
    return (ac + bd) / jnp.sqrt(jnp.float32(d))


@pytest.mark.parametrize("bwd", ["xla", "pallas", "banded", "auto"])
@pytest.mark.parametrize("T", [32, 40])  # 40: T % block != 0 (pad path)
def test_fused_scores_match_dense(bwd, T):
    B, H, D, block = 2, 2, 24, 16
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    qu = jax.random.normal(ks[0], (B, H, T, D))
    qv = jax.random.normal(ks[1], (B, H, T, D))
    k = jax.random.normal(ks[2], (B, H, T, D))
    pos = jax.random.normal(ks[3], (H, 2 * T - 1, D))
    g = jax.random.normal(ks[4], (B, H, T, T))

    s_d = _dense_scores(qu, qv, k, pos)
    s_f = fused_rel_scores(qu, qv, k, pos, block=block, bwd=bwd)
    np.testing.assert_allclose(s_f, s_d, atol=2e-5)

    gd = jax.grad(lambda *a: (_dense_scores(*a) * g).sum(), argnums=(0, 1, 2, 3))(
        qu, qv, k, pos
    )
    gf = jax.grad(
        lambda *a: (fused_rel_scores(*a, block=block, bwd=bwd) * g).sum(),
        argnums=(0, 1, 2, 3),
    )(qu, qv, k, pos)
    for a, b in zip(gd, gf):
        np.testing.assert_allclose(b, a, atol=5e-5)


@pytest.mark.parametrize(
    "limit",
    [
        2 * 2**20,  # forces a smaller backward tile than the forward's 256
        4096,  # nothing fits -> banded falls back to the xla backward
    ],
)
def test_banded_bwd_vmem_repick(limit):
    """The banded backward re-tiles itself under a scoped-VMEM budget.

    At limit=2 MiB the estimator rejects the forward's 256 tile and picks
    128 (t_pad=256 stays divisible); at 4 KiB even the smallest tile is
    rejected and the path must fall back to the xla backward. Gradients
    must match the dense path either way.
    """
    from seq2seq_vc_tpu.ops.rel_scores import (
        _banded_vmem_estimate,
        _pick_banded_block,
    )

    B, H, T, D, block = 1, 1, 256, 64, 256
    # sanity of the scenario itself: 2 MiB sits between est(128) and
    # est(256) for these shapes (qw = d_pad = 128, fp32)
    assert _banded_vmem_estimate(128, 256, 128, 4) <= 2 * 2**20
    assert _banded_vmem_estimate(256, 256, 128, 4) > 2 * 2**20
    if limit == 2 * 2**20:
        assert _pick_banded_block(block, 256, 128, 4, limit) == 128
    else:
        assert _pick_banded_block(block, 256, 128, 4, limit) is None

    ks = jax.random.split(jax.random.PRNGKey(3), 5)
    qu = jax.random.normal(ks[0], (B, H, T, D))
    qv = jax.random.normal(ks[1], (B, H, T, D))
    k = jax.random.normal(ks[2], (B, H, T, D))
    pos = jax.random.normal(ks[3], (H, 2 * T - 1, D))
    g = jax.random.normal(ks[4], (B, H, T, T))

    gd = jax.grad(lambda *a: (_dense_scores(*a) * g).sum(), argnums=(0, 1, 2, 3))(
        qu, qv, k, pos
    )
    gf = jax.grad(
        lambda *a: (
            fused_rel_scores(
                *a, block=block, bwd="banded", bwd_vmem_limit=limit
            )
            * g
        ).sum(),
        argnums=(0, 1, 2, 3),
    )(qu, qv, k, pos)
    for a, b in zip(gd, gf):
        np.testing.assert_allclose(b, a, atol=5e-4)


def test_banded_bwd_tile_never_below_128():
    """Sub-128 tiles are a Pallas TPU LOWERING ERROR, not a slower kernel:
    the last dim of the (1, b2, b2) g block must be a multiple of 128.
    Observed on chip (B2 x T2048 long-context sweep, decoder qw=768,
    default 14 MiB budget): the picker descended 128 -> 64, which 'fit'
    the VMEM estimate and crashed mosaic lowering. When no 128-multiple
    fits, the answer is None (xla fallback), never a smaller tile.
    """
    from seq2seq_vc_tpu.ops.rel_scores import (
        _banded_vmem_estimate,
        _pick_banded_block,
    )

    lim = 14 * 2**20
    # the failing shape: decoder width at T2048 — even 128 exceeds the
    # budget (dtab residency alone is 2*2048*768*4 = 12 MiB)
    assert _banded_vmem_estimate(128, 2048, 768, 4) > lim
    assert _pick_banded_block(512, 2048, 768, 4, lim) is None
    # encoder width at the same T stays banded with a legal tile
    got = _pick_banded_block(512, 2048, 192, 4, lim)
    assert got is not None and got % 128 == 0 and 2048 % got == 0
    # sweep: whatever the budget, the pick is None or a legal 128-multiple
    for budget in (4096, 2**18, 2**20, 2**22, 2**24, 2**26):
        for t_pad, qw in ((256, 128), (768, 768), (2048, 768), (4096, 192)):
            b2 = _pick_banded_block(512, t_pad, qw, 4, budget)
            assert b2 is None or (b2 % 128 == 0 and t_pad % b2 == 0)


def test_auto_bwd_gate_resolution(monkeypatch):
    """bwd='auto' resolves to banded at T >= AUTO_BANDED_MIN_LEN, xla below
    (the chip-measured crossover), and both legs still match dense."""
    import seq2seq_vc_tpu.ops.rel_scores as rs

    picked = []
    real_core = rs._scores_core

    def spy(n_heads, block, scale, interpret, bwd, bwd_vmem_limit):
        picked.append(bwd)
        return real_core(n_heads, block, scale, interpret, bwd, bwd_vmem_limit)

    monkeypatch.setattr(rs, "_scores_core", spy)
    monkeypatch.setattr(rs, "AUTO_BANDED_MIN_LEN", 40)
    B, H, D, block = 1, 2, 24, 16
    for T in (32, 40):
        ks = jax.random.split(jax.random.PRNGKey(T), 4)
        qu, qv, k = (jax.random.normal(ks[i], (B, H, T, D)) for i in range(3))
        pos = jax.random.normal(ks[3], (H, 2 * T - 1, D))
        s = rs.fused_rel_scores(qu, qv, k, pos, block=block, bwd="auto")
        np.testing.assert_allclose(s, _dense_scores(qu, qv, k, pos), atol=2e-5)
    assert picked == ["xla", "banded"]


def test_banded_max_len_cap():
    """On real hardware, banded falls back to xla at t_pad >= BANDED_MAX_LEN
    (chip-observed VMEM stack-placement compile OOM at B2 x T>=3072 —
    long-context sweep r5); interpret mode (CPU tests) keeps the kernel
    exercised at any length. The cap sees the PADDED T: with the default
    512 tile, T=2816 pads to 3072 and must be capped too."""
    from seq2seq_vc_tpu.ops.rel_scores import _resolve_bwd

    # real hardware (interpret=False): cap applies to banded, incl. via auto
    assert _resolve_bwd("banded", 3072, 3072, False) == "xla"
    assert _resolve_bwd("banded", 2816, 3072, False) == "xla"  # padded up
    assert _resolve_bwd("auto", 4096, 4096, False) == "xla"
    assert _resolve_bwd("banded", 2048, 2048, False) == "banded"
    assert _resolve_bwd("auto", 960, 1024, False) == "banded"
    assert _resolve_bwd("auto", 512, 512, False) == "xla"  # below auto gate
    # interpret mode: cap skipped, auto gate still applies
    assert _resolve_bwd("banded", 4096, 4096, True) == "banded"
    assert _resolve_bwd("auto", 4096, 4096, True) == "banded"
    # other variants untouched
    assert _resolve_bwd("xla", 4096, 4096, False) == "xla"
    assert _resolve_bwd("pallas", 4096, 4096, False) == "pallas"


@pytest.mark.parametrize("bwd", ["xla", "pallas", "banded", "auto"])
def test_module_fused_backend_matches_xla(bwd, monkeypatch):
    import seq2seq_vc_tpu.nn.attention as attn_mod

    monkeypatch.setattr(attn_mod, "REL_SCORES_BWD", bwd)
    B, T, F, H = 3, 50, 32, 4
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, F))
    pe = RelPositionalEncoding(F, 0.0)
    _, pos = pe.apply(pe.init(jax.random.PRNGKey(0), x), x)
    mask = jnp.arange(T)[None, :] < jnp.asarray([50, 37, 20])[:, None]
    gout = jax.random.normal(jax.random.PRNGKey(9), (B, T, F))

    m_x = RelPositionMultiHeadedAttention(H, F, backend="xla")
    m_f = RelPositionMultiHeadedAttention(H, F, backend="fused")
    params = m_x.init(jax.random.PRNGKey(2), x, x, x, pos, mask)

    def run(m):
        return jax.value_and_grad(
            lambda p: (m.apply(p, x, x, x, pos, mask) * gout).sum()
        )(params)

    vx, gx = run(m_x)
    vf, gf = run(m_f)
    assert abs(vx - vf) < 1e-4
    for a, b in zip(jax.tree_util.tree_leaves(gx), jax.tree_util.tree_leaves(gf)):
        np.testing.assert_allclose(b, a, atol=1e-4)


def test_fused_backend_falls_back_for_legacy_and_zero_triu():
    """legacy / zero_triu / cross-length calls must take the dense branch
    (the fused kernel is new-style self-attention only) — and still give
    the same result as backend='xla'."""
    B, T, F, H = 2, 20, 16, 2
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, F))
    pe = RelPositionalEncoding(F, 0.0)
    _, pos = pe.apply(pe.init(jax.random.PRNGKey(0), x), x)

    for kwargs in (dict(zero_triu=True),):
        m_x = RelPositionMultiHeadedAttention(H, F, backend="xla", **kwargs)
        m_f = RelPositionMultiHeadedAttention(H, F, backend="fused", **kwargs)
        params = m_x.init(jax.random.PRNGKey(2), x, x, x, pos)
        np.testing.assert_allclose(
            m_f.apply(params, x, x, x, pos),
            m_x.apply(params, x, x, x, pos),
            atol=1e-6,
        )

"""Duration calculator tests."""

import numpy as np
import pytest

from seq2seq_vc_tpu.utils.duration_calculator import (
    calculate_durations,
    calculate_focus_rate,
)


def test_durations_from_diagonal_attention():
    T_feats, T_text = 12, 4
    att = np.full((T_feats, T_text), 0.01)
    # perfect 3-frames-per-token diagonal
    for t in range(T_feats):
        att[t, t // 3] = 0.9
    d, focus = calculate_durations(att)
    np.testing.assert_array_equal(d, [3, 3, 3, 3])
    assert focus == pytest.approx(0.9, abs=1e-6)


def test_durations_pick_most_diagonal_head():
    T_feats, T_text = 8, 2
    diffuse = np.full((T_feats, T_text), 0.5)
    diagonal = np.full((T_feats, T_text), 0.05)
    diagonal[: T_feats // 2, 0] = 0.95
    diagonal[T_feats // 2 :, 1] = 0.95
    att = np.stack([np.stack([diffuse, diagonal])])  # (1 layer, 2 heads, T, S)
    d, focus = calculate_durations(att)
    np.testing.assert_array_equal(d, [4, 4])
    assert focus == pytest.approx(0.95, abs=1e-6)


def test_flash_backend_in_encoder():
    import jax
    import jax.numpy as jnp

    from seq2seq_vc_tpu.nn import Encoder
    from seq2seq_vc_tpu.ops import make_non_pad_mask

    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 16, 20)), jnp.float32)
    mask = make_non_pad_mask(jnp.asarray([16, 9]), 16)
    kwargs = dict(idim=20, attention_dim=32, attention_heads=2, linear_units=64,
                  num_blocks=1, input_layer="linear", dropout_rate=0.0,
                  positional_dropout_rate=0.0, attention_dropout_rate=0.0)
    xla_enc = Encoder(**kwargs, attention_backend="xla")
    params = xla_enc.init(jax.random.PRNGKey(0), x, mask)
    h_xla, _ = xla_enc.apply(params, x, mask)

    flash_enc = Encoder(**kwargs, attention_backend="flash", flash_min_len=0)
    import seq2seq_vc_tpu.ops.flash_attention as fa
    orig = fa.flash_attention
    fa.flash_attention = lambda *a, **k: orig(*a, **{**k, "interpret": True},
                                              block_q=16, block_kv=16)
    try:
        h_flash, _ = flash_enc.apply(params, x, mask)
    finally:
        fa.flash_attention = orig
    np.testing.assert_allclose(np.asarray(h_flash), np.asarray(h_xla), atol=2e-4)

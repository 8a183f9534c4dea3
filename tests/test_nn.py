"""nn layer tests: shapes, rel-shift semantics, KV-cache step == full forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seq2seq_vc_tpu.nn import (
    AlignmentModule,
    ConformerEncoder,
    Conv2dSubsampling,
    Decoder,
    DurationPredictor,
    Encoder,
    MultiHeadedAttention,
    Postnet,
    Prenet,
    RelPositionalEncoding,
    ScaledPositionalEncoding,
    sinusoidal_pe,
)
from seq2seq_vc_tpu.nn.attention import rel_shift
from seq2seq_vc_tpu.ops import make_non_pad_mask, target_mask


def test_sinusoidal_pe_values():
    pe = np.asarray(sinusoidal_pe(10, 8))
    assert pe.shape == (10, 8)
    np.testing.assert_allclose(pe[0], [0, 1, 0, 1, 0, 1, 0, 1], atol=1e-6)
    np.testing.assert_allclose(pe[1, 0], np.sin(1.0), atol=1e-6)
    np.testing.assert_allclose(pe[1, 1], np.cos(1.0), atol=1e-6)


def test_rel_shift_new_style():
    """rel_shift must map score[q, p] (p indexes rel pos T-1..-(T-1)) to
    score[q, q - k] for key k."""
    T, H = 4, 1
    # column p of the input represents relative position rel(p) = T-1-p;
    # after the shift, out[q, k] must hold the value for rel = q - k
    rel_vals = np.arange(T - 1, -T, -1)  # [3, 2, 1, 0, -1, -2, -3] for T=4
    x = np.broadcast_to(rel_vals, (1, H, T, 2 * T - 1)).astype(np.float32)
    out = np.asarray(rel_shift(jnp.asarray(x)))
    assert out.shape == (1, H, T, T)
    for q in range(T):
        for k in range(T):
            assert out[0, 0, q, k] == q - k, (q, k, out[0, 0])


def test_scaled_pos_encoding_alpha():
    mod = ScaledPositionalEncoding(8, 0.0, init_alpha=2.0)
    x = jnp.zeros((1, 5, 8))
    y, params = mod.init_with_output(jax.random.PRNGKey(0), x)
    assert params["params"]["alpha"] == 2.0
    np.testing.assert_allclose(np.asarray(y[0]), 2.0 * np.asarray(sinusoidal_pe(5, 8)), atol=1e-6)


def test_conv2d_subsampling_shapes_and_mask():
    mod = Conv2dSubsampling(odim=32)
    x = jnp.zeros((2, 21, 80))
    mask = make_non_pad_mask(jnp.asarray([21, 13]), 21)
    (h, m), _ = mod.init_with_output(jax.random.PRNGKey(0), x, mask)
    # time: ((21-1)//2 -1)//2 = 4 after two stride-2 valid convs -> (21-2+1)//2=10 -> (10-2+1)//2 = 4
    assert h.shape[0] == 2 and h.shape[2] == 32
    assert m.shape[1] == h.shape[1]
    # reference slicing: mask[:, :-2:2][:, :-2:2]
    want = np.asarray(mask)[:, :-2:2][:, :-2:2]
    np.testing.assert_array_equal(np.asarray(m), want)


def test_transformer_encoder_shapes():
    enc = Encoder(
        idim=80, attention_dim=64, attention_heads=4, linear_units=128,
        num_blocks=2, input_layer="linear", dropout_rate=0.0,
        positional_dropout_rate=0.0,
    )
    x = jnp.ones((2, 15, 80))
    mask = make_non_pad_mask(jnp.asarray([15, 9]), 15)
    (h, m), params = enc.init_with_output(jax.random.PRNGKey(0), x, mask)
    assert h.shape == (2, 15, 64)
    assert (np.asarray(m) == np.asarray(mask)).all()


def test_conformer_encoder_shapes():
    enc = ConformerEncoder(
        idim=80, attention_dim=64, attention_heads=2, linear_units=128,
        num_blocks=2, input_layer="linear", dropout_rate=0.0,
        positional_dropout_rate=0.0, cnn_module_kernel=7,
    )
    x = jnp.ones((2, 12, 80))
    mask = make_non_pad_mask(jnp.asarray([12, 7]), 12)
    (h, m), _ = enc.init_with_output(jax.random.PRNGKey(0), x, mask)
    assert h.shape == (2, 12, 64)
    assert np.isfinite(np.asarray(h)).all()


def test_conformer_padding_invariance():
    """Encoder outputs for valid positions must not depend on pad length."""
    enc = ConformerEncoder(
        idim=8, attention_dim=32, attention_heads=2, linear_units=64,
        num_blocks=2, input_layer="linear", dropout_rate=0.0,
        positional_dropout_rate=0.0, cnn_module_kernel=7,
    )
    rng = np.random.default_rng(0)
    x_short = jnp.asarray(rng.standard_normal((1, 6, 8)), jnp.float32)
    params = enc.init(jax.random.PRNGKey(1), x_short, make_non_pad_mask(jnp.asarray([6]), 6))
    h_short, _ = enc.apply(params, x_short, make_non_pad_mask(jnp.asarray([6]), 6))
    x_long = jnp.pad(x_short, ((0, 0), (0, 5), (0, 0)))
    h_long, _ = enc.apply(params, x_long, make_non_pad_mask(jnp.asarray([6]), 11))
    # masked conv-module norm + pre-conv zeroing make all valid frames exact
    np.testing.assert_allclose(
        np.asarray(h_short)[0], np.asarray(h_long)[0, :6], atol=1e-4
    )


def test_decoder_step_matches_full_forward():
    """The KV-cache incremental path must reproduce teacher-forcing outputs."""
    B, T, D, Tmem = 2, 5, 32, 7
    dec = Decoder(
        odim=-1, attention_dim=D, attention_heads=4, linear_units=64,
        num_blocks=2, dropout_rate=0.0, positional_dropout_rate=0.0,
        input_layer=None, pos_enc_type="scaled", normalize_before=False,
    )
    rng = np.random.default_rng(1)
    tgt = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    memory = jnp.asarray(rng.standard_normal((B, Tmem, D)), jnp.float32)
    mem_mask = make_non_pad_mask(jnp.asarray([7, 4]), Tmem)
    tmask = target_mask(jnp.asarray([T, T]), T)

    params = dec.init(jax.random.PRNGKey(0), tgt, tmask, memory, mem_mask)
    full = dec.apply(params, tgt, tmask, memory, mem_mask)  # (B, T, D)

    cache = dec.apply(params, B, T, method=Decoder.init_cache)
    mem_kv = dec.apply(params, memory, method=Decoder.precompute_memory)
    outs = []
    for t in range(T):
        z, cache, _ = dec.apply(
            params, tgt[:, t : t + 1], jnp.asarray(t), cache, mem_kv, mem_mask,
            method=Decoder.step,
        )
        outs.append(z)
    step_out = np.stack([np.asarray(o) for o in outs], axis=1)
    np.testing.assert_allclose(step_out, np.asarray(full), atol=2e-5)


def test_prenet_dropout_always_on():
    pre = Prenet(idim=80, n_layers=2, n_units=32, dropout_rate=0.5)
    x = jnp.ones((1, 4, 80))
    params = pre.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x)
    y1 = pre.apply(params, x, rngs={"dropout": jax.random.PRNGKey(2)})
    y2 = pre.apply(params, x, rngs={"dropout": jax.random.PRNGKey(3)})
    assert not np.allclose(np.asarray(y1), np.asarray(y2))


def test_postnet_shapes():
    post = Postnet(odim=80, n_layers=5, n_chans=64, n_filts=5)
    x = jnp.ones((2, 9, 80))
    y, _ = post.init_with_output(jax.random.PRNGKey(0), x)
    assert y.shape == (2, 9, 80)


def test_duration_predictor_train_and_infer():
    dp = DurationPredictor(n_layers=2, n_chans=32, kernel_size=3, dropout_rate=0.0)
    x = jnp.ones((2, 6, 16))
    pad = jnp.asarray([[False] * 6, [False] * 3 + [True] * 3])
    params = dp.init(jax.random.PRNGKey(0), x)
    log_d = dp.apply(params, x, pad)
    assert log_d.shape == (2, 6)
    np.testing.assert_allclose(np.asarray(log_d)[1, 3:], 0.0)
    d = dp.apply(params, x, pad, is_inference=True)
    d = np.asarray(d)
    assert (d >= 0).all() and (d == np.round(d)).all()


def test_alignment_module_log_softmax():
    am = AlignmentModule(adim=24)
    rng = np.random.default_rng(2)
    text = jnp.asarray(rng.standard_normal((2, 5, 24)), jnp.float32)
    feats = jnp.asarray(rng.standard_normal((2, 11, 16)), jnp.float32)
    pad = jnp.asarray([[False] * 5, [False] * 3 + [True] * 2])
    lp, _ = am.init_with_output(jax.random.PRNGKey(0), text, feats, pad)
    lp = np.asarray(lp)
    assert lp.shape == (2, 11, 5)
    np.testing.assert_allclose(np.exp(lp).sum(-1), 1.0, atol=1e-5)
    assert (np.exp(lp)[1, :, 3:] == 0).all()


def test_mha_weights_shape():
    mha = MultiHeadedAttention(n_head=4, n_feat=32, dropout_rate=0.0)
    x = jnp.ones((2, 6, 32))
    mask = make_non_pad_mask(jnp.asarray([6, 3]), 6)
    (out, w), _ = mha.init_with_output(
        jax.random.PRNGKey(0), x, x, x, mask, return_weights=True
    )
    assert out.shape == (2, 6, 32)
    assert w.shape == (2, 4, 6, 6)
    np.testing.assert_allclose(np.asarray(w)[1, :, :, 3:], 0.0)


def test_rel_positional_encoding_shapes():
    pe = RelPositionalEncoding(16, 0.0)
    x = jnp.ones((2, 7, 16))
    (y, pos), _ = pe.init_with_output(jax.random.PRNGKey(0), x)
    assert y.shape == (2, 7, 16)
    assert pos.shape == (1, 13, 16)


def test_learnable_fourier_and_stream_pos_enc():
    import jax
    import jax.numpy as jnp

    from seq2seq_vc_tpu.nn import LearnableFourierPosEnc, StreamPositionalEncoding

    x = jnp.zeros((2, 7, 16))
    lf = LearnableFourierPosEnc(16, 0.0)
    y, params = lf.init_with_output(jax.random.PRNGKey(0), x)
    assert y.shape == x.shape and np.isfinite(np.asarray(y)).all()

    sp = StreamPositionalEncoding(16, 0.0)
    p2 = sp.init(jax.random.PRNGKey(0), x)
    full = sp.apply(p2, jnp.ones((1, 10, 16)))
    part = sp.apply(p2, jnp.ones((1, 4, 16)), start_idx=6)
    np.testing.assert_allclose(np.asarray(full)[:, 6:], np.asarray(part), atol=1e-6)


def test_alignment_module_matmul_distance_form():
    """The MXU matmul expansion ||f||^2+||t||^2-2f.t used by
    AlignmentModule must match the reference's broadcast-difference
    distances (values and grads), including at coincident points."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    B, Tf, Tt, C = 2, 40, 12, 64
    f = jnp.asarray(rng.standard_normal((B, Tf, C)).astype(np.float32) * 3)
    t = jnp.asarray(rng.standard_normal((B, Tt, C)).astype(np.float32) * 3)
    t = t.at[0, 3].set(f[0, 7])  # coincident pair: worst cancellation

    def diff_form(f, t):
        return jnp.sqrt(jnp.maximum(
            jnp.sum((f[:, :, None, :] - t[:, None, :, :]) ** 2, -1), 1e-12))

    def matmul_form(f, t):
        f2 = jnp.sum(jnp.square(f), -1)
        t2 = jnp.sum(jnp.square(t), -1)
        cross = jnp.einsum("bfc,btc->bft", f, t,
                           precision=jax.lax.Precision.HIGHEST)
        return jnp.sqrt(jnp.maximum(
            f2[:, :, None] + t2[:, None, :] - 2.0 * cross, 1e-12))

    np.testing.assert_allclose(
        np.asarray(matmul_form(f, t)), np.asarray(diff_form(f, t)), atol=1e-4)
    w = jnp.asarray(rng.standard_normal((B, Tf, Tt)).astype(np.float32))
    g1 = jax.grad(lambda f, t: (jax.nn.log_softmax(-matmul_form(f, t), -1) * w).sum(),
                  argnums=(0, 1))(f, t)
    g2 = jax.grad(lambda f, t: (jax.nn.log_softmax(-diff_form(f, t), -1) * w).sum(),
                  argnums=(0, 1))(f, t)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    # module-level: masked rows excluded, valid log-probs normalized
    from seq2seq_vc_tpu.nn.alignment import AlignmentModule
    text = jnp.asarray(rng.standard_normal((B, Tt, 32)).astype(np.float32))
    feats = jnp.asarray(rng.standard_normal((B, Tf, 20)).astype(np.float32))
    x_masks = jnp.asarray(np.arange(Tt)[None, :] >= np.array([12, 9])[:, None])
    mod = AlignmentModule(adim=32)
    params = mod.init(jax.random.PRNGKey(0), text, feats, x_masks)
    lp = np.asarray(mod.apply(params, text, feats, x_masks))
    valid = ~np.asarray(x_masks)
    assert np.isfinite(lp[np.broadcast_to(valid[:, None, :], lp.shape)]).all()
    p = np.where(np.broadcast_to(valid[:, None, :], lp.shape), np.exp(lp), 0.0)
    np.testing.assert_allclose(p.sum(-1), 1.0, atol=1e-5)

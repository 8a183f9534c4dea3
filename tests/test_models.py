"""Model-level tests: shapes, masking semantics, inference paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seq2seq_vc_tpu.models import AASVC, FastSpeechVC, TransformerTTS, VTN
from seq2seq_vc_tpu.models import AR_VC_MODELS, NAR_VC_MODELS, get_model_class


def small_vtn(**kw):
    args = dict(
        idim=80, odim=80, adim=64, aheads=4, elayers=2, eunits=128,
        dlayers=2, dunits=128, postnet_layers=2, postnet_chans=32,
        dprenet_units=32, decoder_reduction_factor=2,
    )
    args.update(kw)
    return VTN(**args)


def test_registries():
    assert AR_VC_MODELS == ["VTN"]
    assert set(NAR_VC_MODELS) == {"FastSpeechVC", "AASVC"}
    assert get_model_class("VTN") is VTN


def test_vtn_forward_shapes_and_labels():
    model = small_vtn()
    rng = np.random.default_rng(0)
    B, Tin, Lmax = 2, 40, 24
    xs = jnp.asarray(rng.standard_normal((B, Tin, 80)), jnp.float32)
    ilens = jnp.asarray([40, 30])
    ys = jnp.asarray(rng.standard_normal((B, Lmax, 80)), jnp.float32)
    olens = jnp.asarray([24, 17])
    labels = jnp.zeros((B, Lmax))
    keys = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    params = model.init(keys, xs, ilens, ys, labels, olens, deterministic=True)
    out = model.apply(params, xs, ilens, ys, labels, olens, deterministic=True,
                      rngs={"dropout": jax.random.PRNGKey(2)})
    assert out["after_outs"].shape == (B, Lmax, 80)
    assert out["logits"].shape == (B, Lmax)
    # reduction-factor-adjusted lengths: 24, 16
    np.testing.assert_array_equal(np.asarray(out["olens"]), [24, 16])
    labels_adj = np.asarray(out["labels"])
    assert labels_adj[0, 23] == 1.0 and labels_adj[1, 15] == 1.0
    assert labels_adj.sum() == 2.0
    # att_ws: (L, B, H, Lmax//r, Tmem) with Tmem = conv2d-subsampled Tin
    assert out["att_ws"].shape == (2, B, 4, 12, 9)
    np.testing.assert_array_equal(np.asarray(out["ilens_ds_st"]), [9, 6])


def test_vtn_inference_stop_and_lengths():
    model = small_vtn()
    rng = np.random.default_rng(1)
    xs = jnp.asarray(rng.standard_normal((2, 40, 80)), jnp.float32)
    ilens = jnp.asarray([40, 24])
    keys = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    ys = jnp.zeros((2, 8, 80))
    params = model.init(keys, xs, ilens, ys, jnp.zeros((2, 8)), jnp.asarray([8, 8]),
                        deterministic=True)
    inf = model.apply(params, xs, ilens, jax.random.PRNGKey(3), 0.5, 0.0, 4.0,
                      method=VTN.inference)
    B, T, D = inf["outs"].shape
    assert D == 80 and T == 2 * int(9 * 4.0 / 2)
    out_lens = np.asarray(inf["out_lens"])
    assert (out_lens >= 2).all() and (out_lens <= T).all()
    assert (out_lens % 2 == 0).all()
    assert inf["att_ws"].shape[0] == 2  # layers


def test_transformer_tts_forward_and_eos():
    model = TransformerTTS(
        idim=30, odim=80, adim=64, aheads=4, elayers=2, eunits=128,
        dlayers=2, dunits=128, postnet_layers=2, postnet_chans=32,
        dprenet_units=32, decoder_reduction_factor=1,
        use_guided_attn_loss=True,
        num_layers_applied_guided_attn=2, num_heads_applied_guided_attn=2,
    )
    rng = np.random.default_rng(2)
    B, Tmax, Lmax = 2, 11, 16
    xs = jnp.asarray(rng.integers(1, 29, (B, Tmax)), jnp.int32)
    ilens = jnp.asarray([11, 6])
    ys = jnp.asarray(rng.standard_normal((B, Lmax, 80)), jnp.float32)
    olens = jnp.asarray([16, 12])
    labels = jnp.zeros((B, Lmax))
    keys = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    params = model.init(keys, xs, ilens, ys, labels, olens, deterministic=True)
    out = model.apply(params, xs, ilens, ys, labels, olens, deterministic=True,
                      rngs={"dropout": jax.random.PRNGKey(2)})
    assert out["after_outs"].shape == (B, Lmax, 80)
    # guided-attn heads concat: H*L = 2*2
    assert out["att_ws"].shape == (B, 4, Lmax, Tmax + 1)
    np.testing.assert_array_equal(np.asarray(out["ilens"]), [12, 7])

    inf = model.apply(params, xs, ilens, jax.random.PRNGKey(3), 0.5, 0.0, 3.0,
                      method=TransformerTTS.inference)
    assert inf["outs"].shape[-1] == 80


def test_aasvc_forward_deterministic_dp():
    model = AASVC(
        idim=80, odim=80, adim=32, aheads=2, elayers=2, eunits=64,
        dlayers=2, dunits=64, postnet_layers=2, postnet_chans=16,
        post_encoder_reduction_factor=2, decoder_reduction_factor=2,
        duration_predictor_type="deterministic",
        conformer_enc_kernel_size=7, conformer_dec_kernel_size=7,
    )
    rng = np.random.default_rng(3)
    B, Ttxt, Tfeat = 2, 16, 28
    src = jnp.asarray(rng.standard_normal((B, Ttxt, 80)), jnp.float32)
    slens = jnp.asarray([16, 10])
    tgt = jnp.asarray(rng.standard_normal((B, Tfeat, 80)), jnp.float32)
    tlens = jnp.asarray([28, 20])
    keys = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    params = model.init(keys, src, slens, tgt, tlens, deterministic=True)
    out = model.apply(params, src, slens, tgt, tlens, deterministic=True,
                      rngs={"dropout": jax.random.PRNGKey(2)})
    # ds sums to reduced target lengths
    np.testing.assert_array_equal(np.asarray(out["ds"].sum(-1)), np.asarray(out["olens_reduced"]))
    np.testing.assert_array_equal(np.asarray(out["olens_reduced"]), [14, 10])
    assert out["after_outs"].shape == (B, Tfeat, 80)
    assert out["d_outs"].shape == (B, Ttxt // 2)
    assert np.isfinite(float(out["bin_loss"]))
    # log_p_attn rows over valid text sum to 1
    lp = np.asarray(out["log_p_attn"])
    np.testing.assert_allclose(np.exp(lp[0]).sum(-1), 1.0, atol=1e-4)


def test_aasvc_inference_stochastic_dp():
    model = AASVC(
        idim=80, odim=80, adim=32, aheads=2, elayers=2, eunits=64,
        dlayers=2, dunits=64, postnet_layers=0,
        duration_predictor_type="stochastic",
        conformer_enc_kernel_size=7, conformer_dec_kernel_size=7,
        stochastic_duration_predictor_flows=2,
    )
    rng = np.random.default_rng(4)
    src = jnp.asarray(rng.standard_normal((1, 12, 80)), jnp.float32)
    slens = jnp.asarray([12])
    tgt = jnp.asarray(rng.standard_normal((1, 20, 80)), jnp.float32)
    tlens = jnp.asarray([20])
    keys = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
            "noise": jax.random.PRNGKey(2)}
    params = model.init(keys, src, slens, tgt, tlens, deterministic=True)
    inf = model.apply(params, src, slens, max_output_frames=60,
                      method=AASVC.inference, rngs={"noise": jax.random.PRNGKey(3)})
    assert inf["outs"].shape == (1, 60, 80)
    d = np.asarray(inf["d_outs"])
    assert (d <= 10).all() and (d >= 0).all()
    assert int(inf["out_lens"][0]) == int(d.sum())


def test_fastspeech_vc_teacher_durations():
    model = FastSpeechVC(
        idim=80, odim=80, adim=32, aheads=2, elayers=2, eunits=64,
        dlayers=2, dunits=64, postnet_layers=2, postnet_chans=16,
        encoder_type="conformer", decoder_type="conformer",
        encoder_input_layer="linear",
        positionwise_layer_type="linear",
        conformer_enc_kernel_size=7, conformer_dec_kernel_size=7,
        teacher_model_decoder_reduction_factor=2,
    )
    rng = np.random.default_rng(5)
    B, Ttxt = 2, 10
    src = jnp.asarray(rng.standard_normal((B, Ttxt, 80)), jnp.float32)
    slens = jnp.asarray([10, 7])
    ds = jnp.asarray(rng.integers(0, 3, (B, Ttxt)), jnp.int32)
    total = np.asarray(ds.sum(-1)) * 2
    Lmax = 40
    tgt = jnp.asarray(rng.standard_normal((B, Lmax, 80)), jnp.float32)
    tlens = jnp.asarray(total)
    keys = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    params = model.init(keys, src, slens, tgt, tlens, ds, deterministic=True)
    out = model.apply(params, src, slens, tgt, tlens, ds, deterministic=True,
                      rngs={"dropout": jax.random.PRNGKey(2)})
    assert out["after_outs"].shape == (B, Lmax, 80)
    assert out["d_outs"].shape == (B, Ttxt)

    inf = model.apply(params, src, slens, max_output_frames=50,
                      method=FastSpeechVC.inference)
    assert inf["outs"].shape == (B, 50, 80)
    assert (np.asarray(inf["out_lens"]) >= 1).all()

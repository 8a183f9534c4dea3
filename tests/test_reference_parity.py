"""Cross-framework numerical parity against the LIVE reference.

Builds random-init reference torch models (``/root/reference``, run with a
numba stub), converts their state_dicts to flax via
``seq2seq_vc_tpu.convert``, and asserts eval-mode outputs match within fp32
tolerance. This is the "matching" half of the bar: the forward math of
VTN / AASVC / FastSpeechVC / TransformerTTS is proven equal to the
reference implementation, not just capability-equivalent.

Notes on comparisons:
- dropout off everywhere (eval mode both sides; prenet dropout rate 0 since
  the reference prenet drops at inference too).
- BatchNorm running statistics are RANDOMIZED before conversion, so a
  mis-mapped BN would fail loudly (init stats 0/1 could hide a swap).
- Only valid (non-pad) frames are compared where the reference computes
  unmasked conv taps over padding (conformer conv module): the TPU build is
  deliberately pad-invariant, the reference is not, so padded-tail batches
  agree only on interior frames. Full-length batches agree everywhere.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from reference_runtime import load_reference

from seq2seq_vc_tpu.convert import (
    convert_aasvc,
    convert_fastspeech_vc,
    convert_transformer_tts,
    convert_vtn,
)

load_reference()

RTOL = 1e-4
ATOL = 1e-4


def _randomize_bn_stats(module, seed=0):
    g = torch.Generator().manual_seed(seed)
    for m in module.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.3)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)


def _masked_close(ref, ours, lens, rtol=RTOL, atol=ATOL, label=""):
    ref = np.asarray(ref)
    ours = np.asarray(ours)
    T = min(ref.shape[1], ours.shape[1])
    for b in range(ref.shape[0]):
        L = min(int(lens[b]), T)
        np.testing.assert_allclose(
            ours[b, :L], ref[b, :L], rtol=rtol, atol=atol,
            err_msg=f"{label} item {b} (len {L})",
        )


# ---------------------------------------------------------------------- VTN
def _vtn_pair(postnet_bn: bool):
    from seq2seq_vc.models.vtn import VTN as RefVTN

    from seq2seq_vc_tpu.models import VTN

    cfg = dict(
        idim=20, odim=20, adim=32, aheads=2, elayers=2, dlayers=2,
        eunits=64, dunits=64, postnet_layers=2, postnet_chans=16,
        dprenet_layers=2, dprenet_units=24, dprenet_dropout_rate=0.0,
        decoder_reduction_factor=2, use_batch_norm=postnet_bn,
    )
    torch.manual_seed(0)
    ref = RefVTN(**cfg)
    ref.eval()
    if postnet_bn:
        _randomize_bn_stats(ref)
    ours = VTN(**cfg, postnet_norm_type="batch_norm" if postnet_bn else "group_norm")
    variables = convert_vtn(ref.state_dict(), ours)
    return ref, ours, variables


@pytest.mark.parametrize("postnet_bn", [False, True])
def test_vtn_forward_parity(postnet_bn):
    """Eval-mode teacher-forcing forward: after/before outs, stop logits,
    adjusted labels/olens all match the reference (vtn.py:207-300)."""
    ref, ours, variables = _vtn_pair(postnet_bn)
    rng = np.random.default_rng(1)
    B, Tin, Tout = 2, 17, 24
    xs = rng.standard_normal((B, Tin, 20)).astype(np.float32)
    ys = rng.standard_normal((B, Tout, 20)).astype(np.float32)
    ilens = np.array([17, 13])
    olens = np.array([24, 16])
    for b, L in enumerate(ilens):
        xs[b, L:] = 0.0
    for b, L in enumerate(olens):
        ys[b, L:] = 0.0
    labels = np.zeros((B, Tout), np.float32)

    with torch.no_grad():
        r_after, r_before, r_logits, r_ys, r_labels, r_olens, _ = ref(
            torch.from_numpy(xs), torch.from_numpy(ilens),
            torch.from_numpy(ys), torch.from_numpy(labels),
            torch.from_numpy(olens),
        )

    out = ours.apply(
        variables, jnp.asarray(xs), jnp.asarray(ilens), jnp.asarray(ys),
        jnp.asarray(labels), jnp.asarray(olens),
        deterministic=True, rngs={"dropout": jax.random.PRNGKey(0)},
    )
    olens_adj = np.asarray(out["olens"])
    np.testing.assert_array_equal(olens_adj, r_olens.numpy())
    _masked_close(r_before.numpy(), out["before_outs"], olens_adj, label="before")
    _masked_close(r_after.numpy(), out["after_outs"], olens_adj, label="after")
    _masked_close(
        r_logits.numpy()[..., None], np.asarray(out["logits"])[..., None],
        olens_adj, label="logits",
    )
    _masked_close(
        r_labels.numpy()[..., None], np.asarray(out["labels"])[..., None],
        olens_adj, label="labels", rtol=0, atol=0,
    )


def test_vtn_ar_inference_parity():
    """The scan-based batched AR decode reproduces the reference's python
    frame loop (vtn.py:302-394): same frames, same stop step."""
    ref, ours, variables = _vtn_pair(postnet_bn=False)
    rng = np.random.default_rng(2)
    Tin = 11
    x = rng.standard_normal((Tin, 20)).astype(np.float32)

    args = {"threshold": 0.5, "minlenratio": 0.0, "maxlenratio": 3.0}
    with torch.no_grad():
        r_outs, r_probs, _ = ref.inference(torch.from_numpy(x), args)

    out = ours.apply(
        variables, jnp.asarray(x)[None], jnp.asarray([Tin]),
        jax.random.PRNGKey(0), threshold=0.5, minlenratio=0.0, maxlenratio=3.0,
        method=type(ours).inference, rngs={"dropout": jax.random.PRNGKey(1)},
    )
    n = int(out["out_lens"][0])
    # reference stops when sigmoid(prob) >= threshold appears; it then runs
    # the postnet over exactly the generated frames
    assert n == r_outs.shape[0], (n, r_outs.shape)
    np.testing.assert_allclose(
        np.asarray(out["outs"])[0, :n], r_outs.numpy(), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["probs"])[0, :n], r_probs.numpy().reshape(-1)[:n],
        rtol=1e-3, atol=1e-4,
    )


# ---------------------------------------------------------------------- MAS
def test_mas_viterbi_bit_identical():
    """On-device MAS (ops/mas.py) returns bit-identical durations vs the
    reference pure-python DP (alignments.py:63-93) on random matrices."""
    from seq2seq_vc.modules.alignments import viterbi_decode as ref_viterbi

    from seq2seq_vc_tpu.ops.mas import viterbi_decode

    rng = np.random.default_rng(3)
    B, T_feats, T_text = 3, 37, 19
    log_p = np.log(rng.random((B, T_feats, T_text)).astype(np.float32) + 1e-8)
    olens = np.array([37, 25, 20])
    ilens = np.array([19, 11, 7])

    ref_ds, ref_bin = ref_viterbi(
        torch.from_numpy(log_p), torch.from_numpy(ilens), torch.from_numpy(olens)
    )
    ds, bin_loss = viterbi_decode(
        jnp.asarray(log_p), jnp.asarray(ilens), jnp.asarray(olens)
    )
    np.testing.assert_array_equal(np.asarray(ds), ref_ds.numpy())
    np.testing.assert_allclose(float(bin_loss), float(ref_bin), rtol=1e-5)


# -------------------------------------------------------------------- AASVC
def _aasvc_pair(normalize_before=True):
    from seq2seq_vc.models.aas_vc import AASVC as RefAASVC

    from seq2seq_vc_tpu.models import AASVC

    cfg = dict(
        idim=20, odim=20, adim=32, aheads=2, elayers=2, dlayers=2,
        eunits=64, dunits=64, postnet_layers=2, postnet_chans=16,
        duration_predictor_type="deterministic",
        duration_predictor_chans=48,
        conformer_enc_kernel_size=7, conformer_dec_kernel_size=7,
        encoder_input_layer="linear",
        # shipped aas_vc configs set both True; reference defaults are False
        encoder_normalize_before=normalize_before,
        decoder_normalize_before=normalize_before,
    )
    torch.manual_seed(4)
    ref = RefAASVC(**cfg)
    ref.eval()
    _randomize_bn_stats(ref, seed=5)
    ours = AASVC(
        **cfg,
        conformer_conv_norm_type="batch_norm",
        postnet_norm_type="batch_norm",
    )
    variables = convert_aasvc(ref.state_dict(), ours)
    return ref, ours, variables


@pytest.mark.parametrize("normalize_before", [True, False])
def test_aasvc_forward_parity(normalize_before):
    """Full-length batch (the reference conformer conv module is not
    pad-invariant): encoder, MAS durations, duration predictor, Gaussian
    upsampling, decoder, postnet all match (aas_vc.py:279-530)."""
    ref, ours, variables = _aasvc_pair(normalize_before)
    rng = np.random.default_rng(6)
    B, Tin, Tout = 2, 13, 29
    xs = rng.standard_normal((B, Tin, 20)).astype(np.float32)
    ys = rng.standard_normal((B, Tout, 20)).astype(np.float32)
    ilens = np.array([13, 13])
    olens = np.array([29, 29])

    with torch.no_grad():
        r = ref(
            torch.from_numpy(xs), torch.from_numpy(ilens),
            torch.from_numpy(ys), torch.from_numpy(olens),
            None, None,
        )

    out = ours.apply(
        variables, jnp.asarray(xs), jnp.asarray(ilens), jnp.asarray(ys),
        jnp.asarray(olens), deterministic=True,
        rngs={"dropout": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
    )
    np.testing.assert_array_equal(np.asarray(out["ds"]), r["ds"].numpy())
    np.testing.assert_allclose(
        float(out["bin_loss"]), float(r["bin_loss"]), rtol=1e-4
    )
    _masked_close(
        r["log_p_attn"].numpy(), out["log_p_attn"], np.asarray(olens),
        label="log_p_attn",
    )
    _masked_close(
        r["before_outs"].numpy(), out["before_outs"], np.asarray(olens),
        label="before",
    )
    _masked_close(
        r["after_outs"].numpy(), out["after_outs"], np.asarray(olens),
        label="after",
    )
    _masked_close(
        r["d_outs"].numpy()[..., None], np.asarray(out["d_outs"])[..., None],
        np.asarray(out["ilens"]), label="d_outs",
    )


def test_aasvc_dp_projection_forward_parity():
    """``duration_predictor_use_encoder_outputs=False`` (the l2-arctic
    'lsc' recipe family): the separately conv2d-subsampled dp features —
    reference Conv2dSubsampling built with ``use_pos_enc=False``, i.e. a
    BARE ``out`` Linear (aas_vc.py:194-196) — and the nearest
    interpolation onto the encoder grid (aas_vc.py:334-351) must match.
    Guards the converter's dp-projection key layout (the round-5
    released-checkpoint rehearsal caught it assuming the encoder input
    layer's ``out.0`` Sequential form here)."""
    from seq2seq_vc.models.aas_vc import AASVC as RefAASVC

    from seq2seq_vc_tpu.models import AASVC

    cfg = dict(
        idim=20, odim=20, adim=32, aheads=2, elayers=2, dlayers=2,
        eunits=64, dunits=64, postnet_layers=0,
        duration_predictor_type="deterministic",
        duration_predictor_chans=48,
        duration_predictor_use_encoder_outputs=False,
        duration_predictor_input_dim=24,
        conformer_enc_kernel_size=7, conformer_dec_kernel_size=7,
        encoder_input_layer="linear",
        encoder_normalize_before=True, decoder_normalize_before=True,
        use_cnn_in_conformer=False,
        post_encoder_reduction_factor=2,
    )
    torch.manual_seed(14)
    ref = RefAASVC(**cfg)
    ref.eval()
    ours = AASVC(**cfg)
    variables = convert_aasvc(ref.state_dict(), ours)

    rng = np.random.default_rng(15)
    B, Tin, Tout, Tdp = 2, 16, 30, 26
    xs = rng.standard_normal((B, Tin, 20)).astype(np.float32)
    ys = rng.standard_normal((B, Tout, 20)).astype(np.float32)
    dp = rng.standard_normal((B, Tdp, 24)).astype(np.float32)
    ilens = np.array([Tin, Tin])
    olens = np.array([Tout, Tout])
    dlens = np.array([Tdp, Tdp])

    with torch.no_grad():
        r = ref(
            torch.from_numpy(xs), torch.from_numpy(ilens),
            torch.from_numpy(ys), torch.from_numpy(olens),
            dp_inputs=torch.from_numpy(dp),
            dp_lengths=torch.from_numpy(dlens),
        )

    out = ours.apply(
        variables, jnp.asarray(xs), jnp.asarray(ilens), jnp.asarray(ys),
        jnp.asarray(olens), dp_inputs=jnp.asarray(dp), deterministic=True,
        rngs={"dropout": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
    )
    _masked_close(
        r["d_outs"].numpy()[..., None], np.asarray(out["d_outs"])[..., None],
        np.asarray(out["ilens"]), label="d_outs",
    )
    _masked_close(
        r["log_p_attn"].numpy(), out["log_p_attn"], np.asarray(olens),
        label="log_p_attn",
    )
    _masked_close(
        r["before_outs"].numpy(), out["before_outs"], np.asarray(olens),
        label="before",
    )


def test_aasvc_inference_parity():
    """NAR inference with the deterministic duration predictor matches the
    reference decode (aas_vc.py:531-603) on a full-length input."""
    ref, ours, variables = _aasvc_pair()
    rng = np.random.default_rng(7)
    Tin = 13
    x = rng.standard_normal((Tin, 20)).astype(np.float32)

    with torch.no_grad():
        r_outs, r_ds = ref.inference(
            torch.from_numpy(x), dp_input=torch.zeros(Tin, 1)
        )

    out = ours.apply(
        variables, jnp.asarray(x)[None], jnp.asarray([Tin]),
        max_output_frames=max(int(r_outs.shape[0]), 1),
        method=type(ours).inference,
        rngs={"noise": jax.random.PRNGKey(0)},
    )
    n = int(out["out_lens"][0])
    assert n == r_outs.shape[0]
    np.testing.assert_allclose(
        np.asarray(out["outs"])[0, :n], r_outs.numpy(), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_array_equal(
        np.asarray(out["d_outs"])[0].astype(np.int64), r_ds.numpy().reshape(-1)
    )


# ------------------------------------------------------------ FastSpeechVC
def test_fastspeech_vc_forward_parity():
    from seq2seq_vc.models.fastspeech_vc import FastSpeechVC as RefFS

    from seq2seq_vc_tpu.models import FastSpeechVC

    # the reference's transformer-decoder branch is broken in the snapshot
    # (NameError: pos_enc_class, fastspeech_vc.py:183); the shipped config
    # (egs/arctic/vc2/conf/fs2_vc.melmelmel.v1.yaml:57-58) uses
    # conformer/conformer — test that (working) path
    cfg = dict(
        idim=20, odim=20, adim=32, aheads=2, elayers=2, dlayers=2,
        eunits=64, dunits=64, postnet_layers=2, postnet_chans=16,
        duration_predictor_chans=48,
        teacher_model_decoder_reduction_factor=2,
        encoder_type="conformer", decoder_type="conformer",
        conformer_enc_kernel_size=7, conformer_dec_kernel_size=7,
        encoder_normalize_before=True, decoder_normalize_before=True,
    )
    torch.manual_seed(8)
    ref = RefFS(**cfg)
    ref.eval()
    _randomize_bn_stats(ref, seed=9)
    ours = FastSpeechVC(
        **cfg, postnet_norm_type="batch_norm",
        conformer_conv_norm_type="batch_norm",
    )
    variables = convert_fastspeech_vc(ref.state_dict(), ours)

    rng = np.random.default_rng(10)
    B, Tin = 2, 21
    xs = rng.standard_normal((B, Tin, 20)).astype(np.float32)
    # full-length batch: the reference conformer conv module reads pad taps
    ilens = np.array([21, 21])
    # linear input conformer: encoder grid == input grid
    hlens = ilens.copy()
    ds = np.zeros((B, hlens.max()), np.int64)
    g = np.random.default_rng(11)
    ds[0, : hlens[0]] = g.integers(1, 4, hlens[0])
    # same total duration for every item -> no padded tail anywhere (the
    # reference decoder conformer + postnet read unmasked pad taps)
    ds[1, : hlens[1]] = ds[0, : hlens[0]][::-1]
    olens = ds.sum(-1) * cfg["teacher_model_decoder_reduction_factor"]
    Tout = int(olens.max())
    ys = rng.standard_normal((B, Tout, 20)).astype(np.float32)
    for b, L in enumerate(olens):
        ys[b, L:] = 0.0

    with torch.no_grad():
        r_before, r_after, r_douts, r_ilens, r_olens, r_ys = ref(
            torch.from_numpy(xs), torch.from_numpy(ilens),
            torch.from_numpy(ys), torch.from_numpy(olens),
            torch.from_numpy(ds), torch.from_numpy(hlens),
        )

    out = ours.apply(
        variables, jnp.asarray(xs), jnp.asarray(ilens), jnp.asarray(ys),
        jnp.asarray(olens), jnp.asarray(ds), deterministic=True,
        rngs={"dropout": jax.random.PRNGKey(0)},
    )
    olens_np = np.asarray(olens)
    _masked_close(r_before.numpy(), out["before_outs"], olens_np, label="before")
    _masked_close(r_after.numpy(), out["after_outs"], olens_np, label="after")
    _masked_close(
        r_douts.numpy()[..., None], np.asarray(out["d_outs"])[..., None],
        hlens, label="d_outs",
    )


# ---------------------------------------------------------- TransformerTTS
def test_transformer_tts_forward_parity():
    from seq2seq_vc.models.transformer_tts import TransformerTTS as RefTTS

    from seq2seq_vc_tpu.models import TransformerTTS

    cfg = dict(
        idim=30, odim=20, adim=32, aheads=2, elayers=2, dlayers=2,
        eunits=64, dunits=64, postnet_layers=2, postnet_chans=16,
        dprenet_layers=2, dprenet_units=24, dprenet_dropout_rate=0.0,
        decoder_reduction_factor=2,
    )
    torch.manual_seed(12)
    ref = RefTTS(**cfg)
    ref.eval()
    _randomize_bn_stats(ref, seed=13)
    ours = TransformerTTS(**cfg, postnet_norm_type="batch_norm")
    variables = convert_transformer_tts(ref.state_dict(), ours)

    rng = np.random.default_rng(14)
    B, Tin, Tout = 2, 15, 24
    # token ids in [1, idim-2]; eos (idim-1) appended by the model
    xs = rng.integers(1, 28, (B, Tin)).astype(np.int64)
    ilens = np.array([15, 11])
    for b, L in enumerate(ilens):
        xs[b, L:] = 0
    ys = rng.standard_normal((B, Tout, 20)).astype(np.float32)
    olens = np.array([24, 16])
    for b, L in enumerate(olens):
        ys[b, L:] = 0.0
    labels = np.zeros((B, Tout), np.float32)

    with torch.no_grad():
        r_after, r_before, r_logits, r_ys, r_labels, r_olens, *_ = ref(
            torch.from_numpy(xs), torch.from_numpy(ilens),
            torch.from_numpy(ys), torch.from_numpy(labels),
            torch.from_numpy(olens),
        )

    out = ours.apply(
        variables, jnp.asarray(xs), jnp.asarray(ilens), jnp.asarray(ys),
        jnp.asarray(labels), jnp.asarray(olens), deterministic=True,
        rngs={"dropout": jax.random.PRNGKey(0)},
    )
    olens_adj = np.asarray(out["olens"])
    np.testing.assert_array_equal(olens_adj, r_olens.numpy())
    _masked_close(r_before.numpy(), out["before_outs"], olens_adj, label="before")
    _masked_close(r_after.numpy(), out["after_outs"], olens_adj, label="after")


# ------------------------------------------------------------------- losses
def test_seq2seq_loss_parity():
    from seq2seq_vc.losses.seq2seq_loss import Seq2SeqLoss as RefLoss

    from seq2seq_vc_tpu.losses import get_criterion

    rng = np.random.default_rng(15)
    B, T, D = 3, 18, 8
    after = rng.standard_normal((B, T, D)).astype(np.float32)
    before = rng.standard_normal((B, T, D)).astype(np.float32)
    ys = rng.standard_normal((B, T, D)).astype(np.float32)
    logits = rng.standard_normal((B, T)).astype(np.float32)
    labels = (rng.random((B, T)) > 0.9).astype(np.float32)
    olens = np.array([18, 12, 7])

    ref_loss = RefLoss(bce_pos_weight=5.0)
    r_l1, r_bce = ref_loss(
        torch.from_numpy(after), torch.from_numpy(before),
        torch.from_numpy(logits), torch.from_numpy(ys),
        torch.from_numpy(labels), torch.from_numpy(olens),
    )
    crit = get_criterion("Seq2SeqLoss", bce_pos_weight=5.0)
    l1, bce = crit(
        jnp.asarray(after), jnp.asarray(before), jnp.asarray(logits),
        jnp.asarray(ys), jnp.asarray(labels), jnp.asarray(olens),
    )
    np.testing.assert_allclose(float(l1), float(r_l1), rtol=1e-5)
    np.testing.assert_allclose(float(bce), float(r_bce), rtol=1e-5)


def test_forward_sum_loss_parity():
    from seq2seq_vc.losses.forward_sum_loss import ForwardSumLoss as RefFS

    from seq2seq_vc_tpu.ops.forward_sum import beta_binomial_prior, forward_sum_loss

    rng = np.random.default_rng(16)
    B, T_feats, T_text = 2, 21, 9
    log_p = np.log(rng.random((B, T_feats, T_text)).astype(np.float32) + 1e-6)
    ilens = np.array([9, 6])
    olens = np.array([21, 15])

    ref = RefFS(cache_prior=False)
    r = ref(
        torch.from_numpy(log_p), torch.from_numpy(ilens), torch.from_numpy(olens)
    )
    prior = beta_binomial_prior(
        jnp.asarray(ilens), jnp.asarray(olens), T_text, T_feats
    )
    ours = forward_sum_loss(
        jnp.asarray(log_p) + prior, jnp.asarray(ilens), jnp.asarray(olens)
    )
    np.testing.assert_allclose(float(ours), float(r), rtol=1e-4)


def test_forward_sum_loss_grad_parity():
    """The GRADIENT must match torch's quirky ctc_loss backward.

    torch's ``F.ctc_loss`` backward returns ``exp(lp) - posterior`` (the
    logits gradient of a log_softmax) assigned to the log_probs input; the
    reference feeds unnormalized scores, where this differs from the true
    input gradient (``-posterior``) by exp(lp)/target_len per valid cell.
    ``grad_semantics="torch"`` (the default) reproduces it; this locks the
    reference's actual training math (see ops/forward_sum.py).
    """
    from seq2seq_vc.losses.forward_sum_loss import ForwardSumLoss as RefFS

    from seq2seq_vc_tpu.ops.forward_sum import beta_binomial_prior, forward_sum_loss

    rng = np.random.default_rng(17)
    B, T_feats, T_text = 2, 21, 9
    log_p = np.log(rng.random((B, T_feats, T_text)).astype(np.float32) + 1e-6)
    ilens = np.array([9, 6])
    olens = np.array([21, 15])

    lp_t = torch.from_numpy(log_p).requires_grad_(True)
    RefFS(cache_prior=False)(
        lp_t, torch.from_numpy(ilens), torch.from_numpy(olens)
    ).backward()
    g_ref = lp_t.grad.numpy()

    prior = beta_binomial_prior(
        jnp.asarray(ilens), jnp.asarray(olens), T_text, T_feats
    )
    # the prior is an additive constant, so d/d(log_p) == d/d(log_p+prior)
    g_torch_sem = jax.grad(
        lambda lp: forward_sum_loss(
            lp + prior, jnp.asarray(ilens), jnp.asarray(olens)
        )
    )(jnp.asarray(log_p))
    np.testing.assert_allclose(
        np.asarray(g_torch_sem), g_ref, rtol=2e-4, atol=2e-6
    )

    # and the torch-vs-true offset is exactly exp(lp)*mask/(B*ilens)
    g_true = jax.grad(
        lambda lp: forward_sum_loss(
            lp + prior, jnp.asarray(ilens), jnp.asarray(olens),
            grad_semantics="true",
        )
    )(jnp.asarray(log_p))
    tmask = np.arange(T_feats)[None, :, None] < olens[:, None, None]
    kmask = np.arange(T_text)[None, None, :] < ilens[:, None, None]
    offset = (
        np.exp(log_p + np.asarray(prior)) * (tmask & kmask)
        / (B * ilens[:, None, None])
    )
    np.testing.assert_allclose(
        np.asarray(g_torch_sem - g_true), offset, rtol=1e-4, atol=1e-7
    )


def test_guided_attention_loss_parity():
    from seq2seq_vc.losses.guided_attention_loss import (
        GuidedMultiHeadAttentionLoss as RefGA,
    )

    from seq2seq_vc_tpu.losses import get_criterion

    rng = np.random.default_rng(17)
    B, H, Tout, Tin = 2, 3, 14, 11
    att = rng.random((B, H, Tout, Tin)).astype(np.float32)
    ilens = np.array([11, 8])
    olens = np.array([14, 9])

    ref = RefGA(sigma=0.4, alpha=1.0)
    r = ref(
        torch.from_numpy(att), torch.from_numpy(ilens), torch.from_numpy(olens)
    )
    crit = get_criterion("GuidedMultiHeadAttentionLoss", sigma=0.4, alpha=1.0)
    ours = crit(jnp.asarray(att), jnp.asarray(ilens), jnp.asarray(olens))
    np.testing.assert_allclose(float(ours), float(r), rtol=1e-5)


def test_duration_predictor_loss_parity():
    from seq2seq_vc.losses.duration_predictor_loss import (
        DurationPredictorLoss as RefDP,
    )

    from seq2seq_vc_tpu.losses import get_criterion

    rng = np.random.default_rng(18)
    B, T = 3, 12
    d_outs = rng.standard_normal((B, T)).astype(np.float32)
    ds = rng.integers(0, 6, (B, T))
    ilens = np.array([12, 9, 5])
    mask = np.arange(T)[None, :] < ilens[:, None]

    del mask
    ref = RefDP()
    r = ref(
        torch.from_numpy(d_outs), torch.from_numpy(ds), torch.from_numpy(ilens)
    )
    crit = get_criterion("DurationPredictorLoss")
    ours = crit(jnp.asarray(d_outs), jnp.asarray(ds), jnp.asarray(ilens))
    np.testing.assert_allclose(float(ours), float(r), rtol=1e-5)


# ------------------------------------------------------------ checkpoint CLI
def test_convert_checkpoint_cli_roundtrip(tmp_path, monkeypatch):
    """bin/convert_checkpoint maps a reference torch.save checkpoint into a
    native msgpack checkpoint whose restored weights reproduce the
    reference forward (the converters double as reference-ckpt loaders)."""
    import sys

    import yaml

    from seq2seq_vc.models.vtn import VTN as RefVTN

    from seq2seq_vc_tpu.bin.convert_checkpoint import main as convert_main
    from seq2seq_vc_tpu.core.checkpoint import load_checkpoint
    from seq2seq_vc_tpu.models import VTN

    cfg = dict(
        idim=20, odim=20, adim=32, aheads=2, elayers=2, dlayers=2,
        eunits=64, dunits=64, postnet_layers=2, postnet_chans=16,
        dprenet_layers=2, dprenet_units=24, dprenet_dropout_rate=0.0,
        decoder_reduction_factor=2, use_batch_norm=True,
    )
    torch.manual_seed(0)
    ref = RefVTN(**cfg)
    ref.eval()
    _randomize_bn_stats(ref, seed=21)
    torch.save(
        {"model": ref.state_dict(), "steps": 50000, "epochs": 10},
        str(tmp_path / "ckpt.pkl"),
    )
    model_params = dict(cfg, postnet_norm_type="batch_norm")
    (tmp_path / "config.yml").write_text(
        yaml.safe_dump({"model_type": "VTN", "model_params": model_params})
    )
    monkeypatch.setattr(
        sys, "argv",
        ["convert", "--torch-checkpoint", str(tmp_path / "ckpt.pkl"),
         "--config", str(tmp_path / "config.yml"),
         "--outpath", str(tmp_path / "out.ckpt"), "--verbose", "0"],
    )
    convert_main()

    m = VTN(**model_params)
    keys = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    tmpl = m.init(
        keys, jnp.zeros((1, 9, 20)), jnp.asarray([9]), jnp.zeros((1, 8, 20)),
        jnp.zeros((1, 8)), jnp.asarray([8]), deterministic=True,
    )
    restored = load_checkpoint(str(tmp_path / "out.ckpt"), tmpl)
    assert restored["steps"] == 50000
    out = m.apply(
        restored["model"], jnp.ones((1, 9, 20)), jnp.asarray([9]),
        jnp.ones((1, 8, 20)), jnp.zeros((1, 8)), jnp.asarray([8]),
        deterministic=True, rngs={"dropout": jax.random.PRNGKey(2)},
    )
    with torch.no_grad():
        r = ref(
            torch.ones(1, 9, 20), torch.tensor([9]), torch.ones(1, 8, 20),
            torch.zeros(1, 8), torch.tensor([8]),
        )
    np.testing.assert_allclose(
        np.asarray(out["after_outs"])[0], r[0][0].numpy(), rtol=1e-4, atol=1e-4
    )


# ------------------------------------------------------------------- SDP
def test_stochastic_duration_predictor_parity(monkeypatch):
    """The VITS stochastic duration predictor matches the reference under
    IDENTICAL noise (torch.randn patched to a fixed draw; the flax module
    takes the same array via its `noise` argument): training NLL per item
    and inverse-sampled durations both agree — proving the flow-stack
    conversion (affine + spline ConvFlows + DDS convs) end to end."""
    from seq2seq_vc.modules.duration_predictor import (
        StochasticDurationPredictor as RefSDP,
    )

    from seq2seq_vc_tpu.convert.reference import _sdp, _StateDict
    from seq2seq_vc_tpu.nn.flows import StochasticDurationPredictor

    C, B, T = 32, 2, 11
    torch.manual_seed(30)
    ref = RefSDP(
        channels=C, kernel_size=3, dropout_rate=0.0, flows=2, dds_conv_layers=3
    )
    ref.eval()
    ours = StochasticDurationPredictor(
        channels=C, kernel_size=3, dropout_rate=0.0, flows=2, dds_conv_layers=3
    )
    # convert with the top-level prefix the AASVC converter uses
    sd = {f"duration_predictor.{k}": v for k, v in ref.state_dict().items()}
    wrapped = _StateDict(sd)
    params = {"params": _sdp(wrapped, "duration_predictor", 2, 3)}
    wrapped.finish()

    rng = np.random.default_rng(31)
    x = rng.standard_normal((B, T, C)).astype(np.float32)
    mask = np.ones((B, T), bool)
    mask[1, 8:] = False
    w = rng.integers(1, 6, (B, T)).astype(np.float32)
    noise = rng.standard_normal((B, 2, T)).astype(np.float32)

    monkeypatch.setattr(
        torch, "randn", lambda *s, **k: torch.from_numpy(noise[: s[0]])
    )
    with torch.no_grad():
        r_nll = ref(
            torch.from_numpy(x).transpose(1, 2),
            torch.from_numpy(mask[:, None, :].astype(np.float32)),
            w=torch.from_numpy(w[:, None, :]),
        )
    nll = ours.apply(
        params, jnp.asarray(x), jnp.asarray(mask), w=jnp.asarray(w),
        noise=jnp.asarray(noise.transpose(0, 2, 1)),
    )
    np.testing.assert_allclose(np.asarray(nll), r_nll.numpy(), rtol=2e-4, atol=2e-4)

    with torch.no_grad():
        r_d = ref(
            torch.from_numpy(x).transpose(1, 2),
            torch.from_numpy(mask[:, None, :].astype(np.float32)),
            inverse=True, noise_scale=0.8,
        )
    d = ours.apply(
        params, jnp.asarray(x), jnp.asarray(mask), inverse=True,
        noise_scale=0.8, noise=jnp.asarray(noise.transpose(0, 2, 1)),
    )
    # reference returns (B, 1, T) of exp(logw); ours applies ceil
    np.testing.assert_allclose(
        np.asarray(d), np.ceil(r_d[:, 0].numpy() * mask), rtol=0, atol=0
    )


def test_aasvc_stochastic_checkpoint_converts():
    """convert_aasvc covers the FLAGSHIP shipped config (stochastic DP,
    arctic/vc2): a full reference AASVC+SDP state_dict converts with no
    leftover tensors and the flax model runs on the converted params."""
    from seq2seq_vc.models.aas_vc import AASVC as RefAASVC

    from seq2seq_vc_tpu.models import AASVC

    cfg = dict(
        idim=20, odim=20, adim=32, aheads=2, elayers=1, dlayers=1,
        eunits=64, dunits=64, postnet_layers=2, postnet_chans=16,
        duration_predictor_type="stochastic",
        stochastic_duration_predictor_flows=2,
        stochastic_duration_predictor_dds_conv_layers=2,
        conformer_enc_kernel_size=7, conformer_dec_kernel_size=7,
        encoder_normalize_before=True, decoder_normalize_before=True,
    )
    torch.manual_seed(32)
    ref = RefAASVC(**cfg)
    ours = AASVC(
        **cfg, conformer_conv_norm_type="batch_norm",
        postnet_norm_type="batch_norm",
    )
    variables = convert_aasvc(ref.state_dict(), ours)
    rng = np.random.default_rng(33)
    xs = jnp.asarray(rng.standard_normal((2, 13, 20)), jnp.float32)
    ys = jnp.asarray(rng.standard_normal((2, 29, 20)), jnp.float32)
    out = ours.apply(
        variables, xs, jnp.asarray([13, 13]), ys, jnp.asarray([29, 29]),
        deterministic=True,
        rngs={"noise": jax.random.PRNGKey(0)},
    )
    assert np.isfinite(np.asarray(out["after_outs"])).all()
    assert np.isfinite(float(out["dur_nll"]))

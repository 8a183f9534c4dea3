"""Sequence parallelism: ring attention as a configurable training feature.

VERDICT r2 #4: the ring library must be wired, not shelved. These tests run
on the 8-fake-device CPU mesh and assert that an AAS-VC train step with the
conformer time axis sharded over the mesh 'seq' axis (SP=2 and 4) computes
the SAME loss and gradients as the unsharded model — the knob that makes
Hi-Fi-CAPTAIN 48 kHz sequences trainable without O(T^2) score tensors on
one chip (reference egs/hificaptain_jp/vc2/README.md handles that scenario
with batch 2 + grad-accum 8 instead).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seq2seq_vc_tpu.models import AASVC
from seq2seq_vc_tpu.parallel import get_mesh


def _model(sp_mesh=None):
    return AASVC(
        idim=20, odim=20, adim=32, aheads=4, elayers=2, dlayers=2,
        eunits=64, dunits=64, postnet_layers=2, postnet_chans=16,
        duration_predictor_type="deterministic",
        conformer_enc_kernel_size=7, conformer_dec_kernel_size=7,
        encoder_normalize_before=True, decoder_normalize_before=True,
        sp_mesh=sp_mesh,
    )


def _batch():
    rng = np.random.default_rng(0)
    B, T = 2, 16
    xs = jnp.asarray(rng.standard_normal((B, T, 20)), jnp.float32)
    ys = jnp.asarray(rng.standard_normal((B, 2 * T, 20)), jnp.float32)
    # full-ish lengths; the padded tails stay shorter than the seq shards
    ilens = jnp.asarray([16, 12])
    olens = jnp.asarray([32, 24])
    return xs, ilens, ys, olens


def _loss_and_grads(model, params, batch):
    xs, ilens, ys, olens = batch

    def loss_fn(p):
        out = model.apply(
            p, xs, ilens, ys, olens, deterministic=True,
            rngs={"noise": jax.random.PRNGKey(3)},
        )
        return jnp.mean((out["after_outs"] - ys) ** 2) + out["bin_loss"]

    return jax.jit(jax.value_and_grad(loss_fn))(params)


@pytest.mark.parametrize("sp", [2, 4])
def test_aasvc_sp_train_step_matches_unsharded(sp):
    batch = _batch()
    xs, ilens, ys, olens = batch
    ref_model = _model()
    keys = {
        "params": jax.random.PRNGKey(0),
        "dropout": jax.random.PRNGKey(1),
        "noise": jax.random.PRNGKey(2),
    }
    params = jax.jit(
        lambda: ref_model.init(keys, xs, ilens, ys, olens, deterministic=True)
    )()
    ref_loss, ref_grads = _loss_and_grads(ref_model, params, batch)

    # data axis = 2 (the batch size) — use only 2*sp of the fake devices
    mesh = get_mesh(data=2, model=1, seq=sp, devices=jax.devices()[: 2 * sp])
    sp_model = _model(sp_mesh=mesh)
    sp_loss, sp_grads = _loss_and_grads(sp_model, params, batch)

    np.testing.assert_allclose(float(sp_loss), float(ref_loss), rtol=2e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(ref_grads), jax.tree_util.tree_leaves(sp_grads)
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5
        )


def test_aasvc_tp_sp_composed_matches_unsharded():
    """TP x SP composition on a (data=2, model=2, seq=2) mesh.

    Both XLA partitioners (GSPMD and Shardy) mis-scale the kernel gradient
    of seq-sharded k>1 convolutions by the size of a mesh axis the conv
    does not use (exactly 2.0x here) — nn/conv.py swaps the backward to
    shifted dense contractions under the sp_safe_convs scope, restoring
    grad equivalence. scripts/repro_tp_sp.py is the minimized repro.
    """
    from seq2seq_vc_tpu.parallel.tp import shard_params

    batch = _batch()
    xs, ilens, ys, olens = batch
    ref_model = _model()
    keys = {
        "params": jax.random.PRNGKey(0),
        "dropout": jax.random.PRNGKey(1),
        "noise": jax.random.PRNGKey(2),
    }
    params = jax.jit(
        lambda: ref_model.init(keys, xs, ilens, ys, olens, deterministic=True)
    )()
    ref_loss, ref_grads = _loss_and_grads(ref_model, params, batch)

    mesh = get_mesh(data=2, model=2, seq=2, devices=jax.devices()[:8])
    p_tp = shard_params(params, mesh)
    both_loss, both_grads = _loss_and_grads(_model(sp_mesh=mesh), p_tp, batch)

    np.testing.assert_allclose(float(both_loss), float(ref_loss), rtol=2e-5)
    for (path, a), b in zip(
        jax.tree_util.tree_leaves_with_path(ref_grads),
        jax.tree_util.tree_leaves(both_grads),
    ):
        name = "/".join(getattr(p, "key", str(p)) for p in path)
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5, err_msg=name
        )


def test_fastspeech_vc_sp_and_tp_sp_match_unsharded():
    """sequence_parallel (and its TP composition) also covers FastSpeechVC:
    the conformer stacks take the same sp_mesh plumbing as AAS-VC."""
    from seq2seq_vc_tpu.models import FastSpeechVC
    from seq2seq_vc_tpu.parallel.tp import shard_params

    def fs2(sp_mesh=None):
        return FastSpeechVC(
            idim=20, odim=20, adim=32, aheads=4, elayers=2, dlayers=2,
            eunits=64, dunits=64, postnet_layers=2, postnet_chans=16,
            encoder_type="conformer", decoder_type="conformer",
            encoder_input_layer="linear",
            conformer_enc_kernel_size=7, conformer_dec_kernel_size=7,
            encoder_normalize_before=True, decoder_normalize_before=True,
            teacher_model_decoder_reduction_factor=1,
            sp_mesh=sp_mesh,
        )

    rng = np.random.default_rng(0)
    B, T = 2, 16
    xs = jnp.asarray(rng.standard_normal((B, T, 20)), jnp.float32)
    ys = jnp.asarray(rng.standard_normal((B, 2 * T, 20)), jnp.float32)
    ilens = jnp.asarray([16, 12])
    olens = jnp.asarray([32, 24])
    # teacher durations on the encoder grid summing to the target lengths
    ds = np.zeros((B, T), np.int64)
    ds[0, :16] = 2
    ds[1, :12] = 2
    ds = jnp.asarray(ds)

    def loss_and_grads(model, params):
        def loss_fn(p):
            out = model.apply(
                p, xs, ilens, ys, olens, ds, deterministic=True
            )
            return jnp.mean((out["after_outs"] - ys) ** 2) + jnp.mean(
                out["d_outs"] ** 2
            )

        return jax.jit(jax.value_and_grad(loss_fn))(params)

    ref_model = fs2()
    keys = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    params = jax.jit(
        lambda: ref_model.init(keys, xs, ilens, ys, olens, ds, deterministic=True)
    )()
    ref_loss, ref_grads = loss_and_grads(ref_model, params)

    for tag, mesh, p in [
        ("sp", get_mesh(data=2, model=1, seq=2, devices=jax.devices()[:4]), params),
        (
            "tp+sp",
            get_mesh(data=2, model=2, seq=2, devices=jax.devices()[:8]),
            None,
        ),
    ]:
        if p is None:
            p = shard_params(params, mesh)
        loss, grads = loss_and_grads(fs2(sp_mesh=mesh), p)
        np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-5)
        for a, b in zip(
            jax.tree_util.tree_leaves(ref_grads), jax.tree_util.tree_leaves(grads)
        ):
            # fp32 accumulation order differs under sharding, so absolute
            # noise scales with the LEAF's largest elements (grads here run
            # into the thousands) — compare with a per-leaf scaled atol
            a = np.asarray(a)
            np.testing.assert_allclose(
                np.asarray(b), a, rtol=1e-4,
                atol=1e-6 * max(1.0, float(np.abs(a).max())), err_msg=tag,
            )


def test_sp_rejects_legacy_rel_pos():
    mesh = get_mesh(data=2, model=1, seq=4)
    model = _model(sp_mesh=mesh).clone(conformer_rel_pos_type="legacy")
    xs, ilens, ys, olens = _batch()
    keys = {
        "params": jax.random.PRNGKey(0),
        "dropout": jax.random.PRNGKey(1),
        "noise": jax.random.PRNGKey(2),
    }
    with pytest.raises(NotImplementedError, match="new-style"):
        model.init(keys, xs, ilens, ys, olens, deterministic=True)


def test_sp_attention_dropout_trains():
    """Training mode (attention dropout on) runs and yields finite grads;
    the in-ring dropout preserves the softmax normalizer semantics."""
    mesh = get_mesh(data=1, model=1, seq=8)
    model = _model(sp_mesh=mesh).clone(transformer_enc_attn_dropout_rate=0.2)
    xs, ilens, ys, olens = _batch()
    keys = {
        "params": jax.random.PRNGKey(0),
        "dropout": jax.random.PRNGKey(1),
        "noise": jax.random.PRNGKey(2),
    }
    params = jax.jit(
        lambda: model.init(keys, xs, ilens, ys, olens, deterministic=True)
    )()

    def loss_fn(p):
        out = model.apply(
            p, xs, ilens, ys, olens, deterministic=False,
            rngs={"noise": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)},
        )
        return jnp.mean((out["after_outs"] - ys) ** 2) + out["bin_loss"]

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    assert np.isfinite(float(loss))
    for g in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(g)).all()

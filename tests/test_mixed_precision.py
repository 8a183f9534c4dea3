"""Mixed-precision (compute_dtype=bfloat16) numerics.

The bf16 path keeps params, LN/GroupNorm statistics, attention scores,
softmax, and losses in fp32 while running the residual stream, matmuls and
convs in bf16 (the train step is HBM-bandwidth-bound at fp32 — see
scripts/profile_train.py). These tests pin the contract: same param tree as
fp32, bounded output deviation, finite gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seq2seq_vc_tpu.models import AASVC
from seq2seq_vc_tpu.nn.conformer import ConformerEncoder


def _conformer(dtype):
    return ConformerEncoder(
        idim=80, attention_dim=64, attention_heads=2, linear_units=128,
        num_blocks=2, input_layer="linear", pos_enc_layer_type="rel_pos",
        selfattention_layer_type="rel_selfattn", cnn_module_kernel=7,
        dtype=dtype,
    )


def test_conformer_bf16_matches_f32_closely():
    rng = np.random.default_rng(0)
    xs = rng.standard_normal((2, 48, 80)).astype(np.float32)
    mask = np.ones((2, 48), bool)
    mask[1, 32:] = False
    m32, m16 = _conformer(None), _conformer(jnp.bfloat16)
    p = m32.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        xs, mask, deterministic=True,
    )
    o32, _ = m32.apply(p, xs, mask, deterministic=True)
    o16, _ = m16.apply(p, xs, mask, deterministic=True)
    assert o16.dtype == jnp.float32  # stack casts back to fp32 at the exit
    a, b = np.asarray(o32), np.asarray(o16)
    # normalized RMS deviation: bf16 rounding through 2 blocks stays ~1%
    nrms = np.sqrt(((a - b) ** 2).mean()) / (a.std() + 1e-9)
    assert nrms < 0.05, nrms


def test_conformer_bf16_param_tree_identical():
    xs = np.zeros((1, 16, 80), np.float32)
    mask = np.ones((1, 16), bool)
    keys = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    p32 = _conformer(None).init(keys, xs, mask, deterministic=True)
    p16 = _conformer(jnp.bfloat16).init(keys, xs, mask, deterministic=True)
    flat32 = jax.tree_util.tree_flatten_with_path(p32)[0]
    flat16 = jax.tree_util.tree_flatten_with_path(p16)[0]
    assert [(k, v.shape, v.dtype) for k, v in flat32] == [
        (k, v.shape, v.dtype) for k, v in flat16
    ]
    # params stay fp32 in bf16 mode (master weights)
    assert all(v.dtype == jnp.float32 for _, v in flat16)


@pytest.mark.slow
def test_aasvc_bf16_train_grads_finite():
    model = AASVC(
        idim=80, odim=80, adim=32, aheads=2, elayers=2, eunits=64,
        dlayers=2, dunits=64, postnet_layers=2, postnet_chans=16,
        post_encoder_reduction_factor=2, duration_predictor_type="stochastic",
        stochastic_duration_predictor_flows=2,
        conformer_enc_kernel_size=7, conformer_dec_kernel_size=7,
        compute_dtype="bfloat16",
    )
    rng = np.random.default_rng(0)
    xs = rng.standard_normal((2, 32, 80)).astype(np.float32)
    lens = np.array([32, 24], np.int32)
    keys = {
        "params": jax.random.PRNGKey(0),
        "dropout": jax.random.PRNGKey(1),
        "noise": jax.random.PRNGKey(2),
    }
    p = jax.jit(
        lambda: model.init(keys, xs, lens, xs, lens, deterministic=True)
    )()

    def loss(p):
        o = model.apply(
            p, xs, lens, xs, lens, deterministic=True,
            rngs={"noise": jax.random.PRNGKey(5)},
        )
        return jnp.mean(jnp.abs(o["after_outs"])) + o["dur_nll"] + o["bin_loss"]

    g = jax.jit(jax.grad(loss))(p)
    leaves = jax.tree_util.tree_leaves(g)
    assert leaves and all(bool(jnp.isfinite(x).all()) for x in leaves)
    assert all(x.dtype == jnp.float32 for x in leaves)

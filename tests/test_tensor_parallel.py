"""Tensor parallelism: the mesh's ``model`` axis actually shards params.

A TPU-native extension beyond the reference (SURVEY.md §2.10: reference is
DP-only). The tests run on the 8-fake-device CPU mesh from conftest and
assert (a) the Megatron-style rules physically distribute the wide kernels,
(b) loss and grads are numerically identical to the unsharded computation
(XLA inserts the collectives from the sharding annotations alone).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from seq2seq_vc_tpu.models import AASVC
from seq2seq_vc_tpu.parallel import (
    get_mesh,
    shard_params,
    tp_param_specs,
)


def _tiny_aasvc():
    return AASVC(
        idim=20, odim=20, adim=32, aheads=4, elayers=2, dlayers=2,
        eunits=64, dunits=64, postnet_layers=2, postnet_chans=16,
        duration_predictor_type="deterministic",
        conformer_enc_kernel_size=7, conformer_dec_kernel_size=7,
        encoder_normalize_before=True, decoder_normalize_before=True,
    )


def _batch():
    rng = np.random.default_rng(0)
    B, T = 4, 16
    xs = jnp.asarray(rng.standard_normal((B, T, 20)), jnp.float32)
    ys = jnp.asarray(rng.standard_normal((B, 2 * T, 20)), jnp.float32)
    ilens = jnp.asarray([16, 16, 12, 12])
    olens = jnp.asarray([32, 32, 24, 24])
    return xs, ilens, ys, olens


@pytest.mark.parametrize("model_size", [2, 4])
def test_tp_train_step_matches_unsharded(model_size):
    model = _tiny_aasvc()
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
            p, xs, ilens, ys, olens, deterministic=True,
            rngs={"noise": jax.random.PRNGKey(3)},
        )
        return jnp.mean((out["after_outs"] - ys) ** 2) + out["bin_loss"]

    ref_loss, ref_grads = jax.jit(jax.value_and_grad(loss_fn))(params)

    mesh = get_mesh(data=8 // model_size, model=model_size)
    sharded = shard_params(params, mesh)
    tp_loss, tp_grads = jax.jit(jax.value_and_grad(loss_fn))(sharded)

    np.testing.assert_allclose(float(tp_loss), float(ref_loss), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(ref_grads), jax.tree_util.tree_leaves(tp_grads)
    ):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5)


def test_tp_rules_physically_shard_the_wide_kernels():
    model = _tiny_aasvc()
    xs, ilens, ys, olens = _batch()
    keys = {
        "params": jax.random.PRNGKey(0),
        "dropout": jax.random.PRNGKey(1),
        "noise": jax.random.PRNGKey(2),
    }
    params = jax.jit(
        lambda: model.init(keys, xs, ilens, ys, olens, deterministic=True)
    )()
    mesh = get_mesh(data=2, model=4)
    specs = tp_param_specs(params, mesh)
    flat_specs = jax.tree_util.tree_flatten_with_path(specs)[0]
    n_split = sum(1 for _, s in flat_specs if s != P())
    assert n_split >= 40  # every attention + FFN kernel in 4 conformer blocks

    sharded = shard_params(params, mesh)
    seen = {"col": False, "row": False}
    for path, leaf in jax.tree_util.tree_flatten_with_path(sharded)[0]:
        names = tuple(getattr(p, "key", str(p)) for p in path)
        shard = leaf.addressable_shards[0].data
        if names[-2:] == ("linear_q", "kernel"):
            assert shard.shape == (leaf.shape[0], leaf.shape[1] // 4)
            seen["col"] = True
        if names[-2:] == ("linear_out", "kernel"):
            assert shard.shape == (leaf.shape[0] // 4, leaf.shape[1])
            seen["row"] = True
    assert all(seen.values())


def test_tp_specs_fall_back_to_replicated_when_indivisible():
    mesh = get_mesh(data=2, model=4)
    params = {"feed_forward": {"Dense_0": {"kernel": jnp.zeros((10, 6))}}}
    specs = tp_param_specs(params, mesh)
    assert specs["feed_forward"]["Dense_0"]["kernel"] == P()

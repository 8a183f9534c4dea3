"""Pipeline parallelism (parallel/pp.py): forward + grad equivalence vs the
serial layer stack on the fake 8-device CPU mesh.

The reference has no pipeline parallelism (SURVEY.md §2.10); this proves the
TPU-native GPipe schedule computes the identical function and gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from seq2seq_vc_tpu.parallel.pp import (
    pipeline_apply,
    pipeline_shard_params,
    stack_layer_params,
)


def _layer_fn(p, x):
    # a residual gated MLP layer — nonlinear so grad mistakes can't cancel
    h = jnp.tanh(x @ p["w1"] + p["b1"])
    return x + h @ p["w2"]


def _make_params(n_layers, d, key):
    keys = jax.random.split(key, n_layers)
    layers = []
    for k in keys:
        k1, k2 = jax.random.split(k)
        layers.append(
            {
                "w1": jax.random.normal(k1, (d, 2 * d)) * 0.3,
                "b1": jnp.zeros((2 * d,)),
                "w2": jax.random.normal(k2, (2 * d, d)) * 0.3,
            }
        )
    return layers


def _serial(layers, xs):
    h = xs
    for p in layers:
        h = _layer_fn(p, h)
    return h


def _pipe_mesh(n):
    return Mesh(np.asarray(jax.devices()[:n]), ("pipe",))


@pytest.mark.parametrize("n_stages,n_layers", [(2, 4), (4, 4), (8, 8)])
def test_forward_matches_serial(n_stages, n_layers):
    d, n_micro, mb = 8, 6, 3
    key = jax.random.PRNGKey(0)
    layers = _make_params(n_layers, d, key)
    xs = jax.random.normal(jax.random.PRNGKey(1), (n_micro, mb, d))

    mesh = _pipe_mesh(n_stages)
    stacked = stack_layer_params(layers)
    out = pipeline_apply(_layer_fn, stacked, xs, mesh=mesh)
    ref = _serial(layers, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-6)


def test_grads_match_serial():
    d, n_layers, n_stages, n_micro, mb = 8, 4, 4, 8, 2
    layers = _make_params(n_layers, d, jax.random.PRNGKey(2))
    xs = jax.random.normal(jax.random.PRNGKey(3), (n_micro, mb, d))
    tgt = jax.random.normal(jax.random.PRNGKey(4), (n_micro, mb, d))
    mesh = _pipe_mesh(n_stages)
    stacked = stack_layer_params(layers)

    def loss_pipe(stacked_p):
        out = pipeline_apply(_layer_fn, stacked_p, xs, mesh=mesh)
        return jnp.mean((out - tgt) ** 2)

    def loss_serial(stacked_p):
        def body(h, one):
            return _layer_fn(one, h), None

        out, _ = jax.lax.scan(body, xs, stacked_p)
        return jnp.mean((out - tgt) ** 2)

    g_pipe = jax.jit(jax.grad(loss_pipe))(stacked)
    g_ser = jax.jit(jax.grad(loss_serial))(stacked)
    flat_p, _ = jax.tree_util.tree_flatten(g_pipe)
    flat_s, _ = jax.tree_util.tree_flatten(g_ser)
    for a, b in zip(flat_p, flat_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6)


def test_sharded_param_placement_trains():
    """Params physically sharded over the pipe axis: one SGD step runs and
    changes the loss (the deployment layout, not just the math)."""
    d, n_layers, n_stages, n_micro, mb = 8, 8, 8, 8, 2
    layers = _make_params(n_layers, d, jax.random.PRNGKey(5))
    xs = jax.random.normal(jax.random.PRNGKey(6), (n_micro, mb, d))
    tgt = 0.5 * xs
    mesh = _pipe_mesh(n_stages)
    stacked = pipeline_shard_params(stack_layer_params(layers), mesh)

    @jax.jit
    def step(p):
        def loss(p):
            out = pipeline_apply(_layer_fn, p, xs, mesh=mesh)
            return jnp.mean((out - tgt) ** 2)

        l, g = jax.value_and_grad(loss)(p)
        p = jax.tree_util.tree_map(lambda a, b: a - 0.05 * b, p, g)
        return l, p

    l0, p1 = step(stacked)
    l1, _ = step(p1)
    assert np.isfinite(float(l0)) and float(l1) < float(l0)


def test_indivisible_layers_raise():
    d = 4
    layers = _make_params(3, d, jax.random.PRNGKey(7))
    xs = jnp.zeros((2, 2, d))
    mesh = _pipe_mesh(2)
    with pytest.raises(ValueError):
        pipeline_apply(_layer_fn, stack_layer_params(layers), xs, mesh=mesh)

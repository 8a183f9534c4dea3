"""Unit tests for the partitioner-safe Conv backward (nn/conv.py).

The safe path replaces XLA's conv kernel-grad lowering with shifted dense
contractions under the ``safe_conv_grads`` scope (the TP x SP workaround —
see scripts/repro_tp_sp.py). These tests pin, on a single device:

- backward == stock autodiff backward for every eligible shape class
  (k>1 odd, stride 1, SAME, with/without feature groups);
- ineligible convs (even k, strides, dilation, 2-D) fall back to the
  stock lowering and still differentiate correctly inside the scope;
- outside the scope the module is bit-identical to flax.linen.Conv.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seq2seq_vc_tpu.nn.conv import Conv, safe_conv_grads


def _grads(module, x, variables):
    def loss(v, x):
        y = module.apply(v, x)
        return jnp.sum(jnp.sin(y) * y)

    return jax.grad(loss, argnums=(0, 1))(variables, x)


@pytest.mark.parametrize(
    "kernel,groups",
    [(3, 1), (7, 1), (31, 1), (7, 8), (15, 4)],
)
def test_safe_backward_matches_stock(kernel, groups):
    rng = np.random.default_rng(0)
    B, T, C = 2, 24, 16
    x = jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32)

    stock = nn.Conv(C, (kernel,), padding="SAME", feature_group_count=groups)
    safe = Conv(C, (kernel,), padding="SAME", feature_group_count=groups)
    v = stock.init(jax.random.PRNGKey(0), x)

    y_stock = stock.apply(v, x)
    with safe_conv_grads(True):
        y_safe = jax.jit(safe.apply)(v, x)
        gv_safe, gx_safe = jax.jit(lambda v, x: _grads(safe, x, v))(v, x)
    gv_stock, gx_stock = _grads(stock, x, v)

    np.testing.assert_array_equal(np.asarray(y_safe), np.asarray(y_stock))
    np.testing.assert_allclose(
        np.asarray(gx_safe), np.asarray(gx_stock), rtol=1e-5, atol=1e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(gv_stock), jax.tree_util.tree_leaves(gv_safe)
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-5
        )


@pytest.mark.parametrize(
    "conv_kwargs,ndim",
    [
        (dict(features=8, kernel_size=(4,), padding="SAME"), 3),  # even k
        (dict(features=8, kernel_size=(3,), strides=(2,), padding="SAME"), 3),
        (dict(features=8, kernel_size=(3,), kernel_dilation=2, padding="SAME"), 3),
        (dict(features=8, kernel_size=(3,), padding="VALID"), 3),
        (dict(features=8, kernel_size=(3, 3), padding="SAME"), 4),  # 2-D
    ],
)
def test_ineligible_convs_fall_back_and_match_stock(conv_kwargs, ndim):
    rng = np.random.default_rng(1)
    shape = (2, 20, 8) if ndim == 3 else (2, 12, 12, 8)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)

    stock = nn.Conv(**conv_kwargs)
    safe = Conv(**conv_kwargs)
    v = stock.init(jax.random.PRNGKey(0), x)

    with safe_conv_grads(True):
        y_safe = safe.apply(v, x)
        gv_safe, gx_safe = _grads(safe, x, v)
    y_stock = stock.apply(v, x)
    gv_stock, gx_stock = _grads(stock, x, v)

    np.testing.assert_array_equal(np.asarray(y_safe), np.asarray(y_stock))
    np.testing.assert_array_equal(np.asarray(gx_safe), np.asarray(gx_stock))
    for a, b in zip(
        jax.tree_util.tree_leaves(gv_stock), jax.tree_util.tree_leaves(gv_safe)
    ):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))


def test_outside_scope_is_stock_conv():
    """No scope -> identical params, names, outputs, and grads."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 16, 8)), jnp.float32)
    stock = nn.Conv(8, (5,), padding="SAME")
    safe = Conv(8, (5,), padding="SAME")
    v_stock = stock.init(jax.random.PRNGKey(0), x)
    v_safe = safe.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v_stock) == jax.tree_util.tree_structure(
        v_safe
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(v_stock), jax.tree_util.tree_leaves(v_safe)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(safe.apply(v_stock, x)), np.asarray(stock.apply(v_stock, x))
    )
    gv_stock, _ = _grads(stock, x, v_stock)
    gv_safe, _ = _grads(safe, x, v_stock)
    for a, b in zip(
        jax.tree_util.tree_leaves(gv_stock), jax.tree_util.tree_leaves(gv_safe)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

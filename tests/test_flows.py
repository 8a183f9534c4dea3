"""Flow tests: spline invertibility, logdet correctness, SDP both directions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seq2seq_vc_tpu.nn.flows import (
    ConvFlow,
    DilatedDepthSeparableConv,
    ElementwiseAffineFlow,
    StochasticDurationPredictor,
    flip_flow,
    log_flow,
    piecewise_rational_quadratic_transform,
)


def test_spline_roundtrip_and_logdet():
    rng = np.random.default_rng(0)
    shape = (2, 3, 16)
    x = jnp.asarray(rng.uniform(-4.5, 4.5, shape), jnp.float32)
    uw = jnp.asarray(rng.standard_normal(shape + (10,)), jnp.float32)
    uh = jnp.asarray(rng.standard_normal(shape + (10,)), jnp.float32)
    ud = jnp.asarray(rng.standard_normal(shape + (9,)), jnp.float32)

    y, ld = piecewise_rational_quadratic_transform(x, uw, uh, ud, inverse=False)
    x2, ld_inv = piecewise_rational_quadratic_transform(y, uw, uh, ud, inverse=True)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=2e-4)
    np.testing.assert_allclose(np.asarray(ld + ld_inv), 0.0, atol=2e-4)

    # logdet == log |dy/dx| via autodiff on a scalar slice
    def f(xi):
        yi, _ = piecewise_rational_quadratic_transform(
            xi.reshape(1, 1, 1), uw[:1, :1, :1], uh[:1, :1, :1], ud[:1, :1, :1]
        )
        return yi.reshape(())

    g = jax.grad(f)(x[0, 0, 0].reshape(()))
    _, ld0 = piecewise_rational_quadratic_transform(
        x[:1, :1, :1], uw[:1, :1, :1], uh[:1, :1, :1], ud[:1, :1, :1]
    )
    np.testing.assert_allclose(np.log(np.abs(np.asarray(g))), np.asarray(ld0).item(), atol=1e-4)


def test_spline_outside_domain_identity():
    x = jnp.asarray([[[-7.0, 7.0]]], jnp.float32)
    uw = jnp.zeros((1, 1, 2, 10))
    uh = jnp.zeros((1, 1, 2, 10))
    ud = jnp.zeros((1, 1, 2, 9))
    y, ld = piecewise_rational_quadratic_transform(x, uw, uh, ud)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x))
    np.testing.assert_allclose(np.asarray(ld), 0.0)


def test_elementwise_affine_roundtrip():
    flow = ElementwiseAffineFlow(2)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 5, 2)), jnp.float32)
    mask = jnp.ones((2, 5, 1))
    params = flow.init(jax.random.PRNGKey(0), x, mask)
    y, ld = flow.apply(params, x, mask)
    x2 = flow.apply(params, y, mask, inverse=True)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-6)


def test_conv_flow_roundtrip():
    flow = ConvFlow(2, 24, 3, 2)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(-3, 3, (2, 7, 2)), jnp.float32)
    mask = jnp.ones((2, 7, 1))
    params = flow.init(jax.random.PRNGKey(0), x, mask)
    y, ld = flow.apply(params, x, mask)
    # zero-init projection -> identity-ish at init, logdet should be finite
    assert np.isfinite(np.asarray(ld)).all()
    x2 = flow.apply(params, y, mask, inverse=True)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)


def test_log_flip_flows():
    x = jnp.asarray([[[1.0, 2.0], [3.0, 4.0]]])
    mask = jnp.ones((1, 2, 1))
    y, ld = log_flow(x, mask)
    np.testing.assert_allclose(np.asarray(log_flow(y, mask, inverse=True)), np.asarray(x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ld), -np.log(24.0), atol=1e-5)
    z, ld0 = flip_flow(x)
    np.testing.assert_array_equal(np.asarray(z), np.asarray(x)[..., ::-1])
    assert (np.asarray(ld0) == 0).all()


def test_sdp_nll_and_sampling():
    sdp = StochasticDurationPredictor(channels=16, flows=2, dds_conv_layers=2)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 6, 16)), jnp.float32)
    x_mask = jnp.asarray([[True] * 6, [True] * 4 + [False] * 2])
    w = jnp.asarray(rng.integers(1, 5, (2, 6)), jnp.float32)
    keys = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}
    params = sdp.init(keys, x, x_mask, w=w, deterministic=True)
    nll = sdp.apply(params, x, x_mask, w=w, deterministic=True,
                    rngs={"noise": jax.random.PRNGKey(2)})
    assert nll.shape == (2,)
    assert np.isfinite(np.asarray(nll)).all()
    dur = sdp.apply(params, x, x_mask, inverse=True, noise_scale=0.8,
                    deterministic=True, rngs={"noise": jax.random.PRNGKey(3)})
    dur = np.asarray(dur)
    assert dur.shape == (2, 6)
    assert (dur >= 0).all() and (dur == np.ceil(dur)).all()
    np.testing.assert_allclose(dur[1, 4:], 0.0)

    # gradient flows through the NLL w.r.t. SDP params
    def loss_fn(p):
        return jnp.sum(
            sdp.apply(p, x, x_mask, w=w, deterministic=True,
                      rngs={"noise": jax.random.PRNGKey(2)})
        )

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert any(np.abs(np.asarray(l)).sum() > 0 for l in leaves)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)

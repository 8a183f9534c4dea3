"""Ring attention (sequence-parallel over a mesh) vs dense attention."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import mesh_utils
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from seq2seq_vc_tpu.parallel.ring_attention import ring_attention


def _dense(q, k, v, kv_lens=None, causal=False):
    B, H, T, D = q.shape
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(D)
    valid = jnp.ones((B, 1, T, T), bool)
    if kv_lens is not None:
        valid = valid & (jnp.arange(T)[None, :] < kv_lens[:, None])[:, None, None, :]
    if causal:
        valid = valid & (jnp.arange(T)[None, :] <= jnp.arange(T)[:, None])[None, None]
    s = jnp.where(valid, s, -1e30)
    p = jax.nn.softmax(s, -1)
    p = jnp.where(valid, p, 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def _ring_fn(mesh, causal, with_lens):
    lens_spec = (P(),) if with_lens else ()
    fn = shard_map(
        functools.partial(ring_attention, axis_name="sp", causal=causal),
        mesh=mesh,
        in_specs=(P(None, None, "sp", None),) * 3 + lens_spec,
        out_specs=P(None, None, "sp", None),
        check_rep=False,
    )
    return jax.jit(fn)


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention_matches_dense(causal):
    devs = jax.devices()
    assert len(devs) >= 8, "conftest provides 8 fake CPU devices"
    mesh = Mesh(mesh_utils.create_device_mesh((8,)), ("sp",))
    rng = np.random.default_rng(0)
    B, H, T, D = 2, 2, 64, 16  # T_local = 8 per device
    q, k, v = (jnp.asarray(rng.standard_normal((B, H, T, D)).astype(np.float32))
               for _ in range(3))
    lens = jnp.asarray(np.array([64, 41], np.int32))

    got = _ring_fn(mesh, causal, True)(q, k, v, lens)
    want = _dense(q, k, v, kv_lens=lens, causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_ring_attention_grads_match_dense():
    mesh = Mesh(mesh_utils.create_device_mesh((8,)), ("sp",))
    rng = np.random.default_rng(1)
    B, H, T, D = 1, 2, 32, 8
    q, k, v = (jnp.asarray(rng.standard_normal((B, H, T, D)).astype(np.float32))
               for _ in range(3))
    lens = jnp.asarray(np.array([27], np.int32))
    w = jnp.asarray(rng.standard_normal((B, H, T, D)).astype(np.float32))
    w = w * (jnp.arange(T)[None, None, :, None] < lens[:, None, None, None])

    ring = _ring_fn(mesh, False, True)
    g1 = jax.grad(lambda q, k, v: (ring(q, k, v, lens) * w).sum(), argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda q, k, v: (_dense(q, k, v, lens) * w).sum(), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)

"""Pipeline parallelism: GPipe-style microbatch pipelining over a ``pipe``
mesh axis with ``lax.ppermute`` activation handoff.

The reference has no pipeline parallelism (SURVEY.md §2.10 — it is
single-model DDP only); this is a TPU-native extension for deep stacks
whose *parameters* don't fit one chip (or whose per-layer weight streaming
should be split across chips). The design is the standard TPU recipe (see
the public scaling-book pipelining chapter): stack the per-layer parameter
pytrees along a leading "stage" axis, shard that axis over the mesh's
``pipe`` dimension, and inside ``shard_map`` march microbatches through the
stages — each tick every device applies its resident layer block to the
activation it holds, then hands the result to its ICI neighbor with
``lax.ppermute``. ``jax.grad`` through the shard_mapped function yields the
exact GPipe backward for free (the transpose of ``ppermute`` is the
reversed permutation), so no manual backward schedule is needed.

Complexity: ``n_micro + n_stages - 1`` ticks; bubble fraction
``(n_stages-1) / (n_micro + n_stages - 1)`` — choose ``n_micro >= 4 *
n_stages`` to keep it under ~20%.

Grad-equivalence vs the serial stack is proven on the fake 8-device CPU
mesh in ``tests/test_pipeline_parallel.py``; ``__graft_entry__.
dryrun_multichip`` runs a pp=2 training step as part of the driver gate.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map


def stack_layer_params(layer_params: list) -> Any:
    """Stack a list of identically-shaped per-layer param pytrees along a new
    leading axis (the stage/layer axis that ``pipeline_apply`` shards)."""
    return jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, axis=0), *layer_params
    )


def pipeline_apply(
    layer_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
    stacked_params: Any,
    xs: jnp.ndarray,
    *,
    mesh: Mesh,
    axis_name: str = "pipe",
    params_in_spec: P | None = None,
) -> jnp.ndarray:
    """Run microbatches ``xs`` through a layer stack pipelined over ``mesh``.

    Args:
        layer_fn: ``(one_layer_params, x) -> x`` — applies ONE layer.
        stacked_params: pytree with leading axis ``n_layers`` on every leaf
            (see :func:`stack_layer_params`). ``n_layers`` must be divisible
            by the mesh's ``axis_name`` size; each device runs the block of
            ``n_layers // n_stages`` consecutive layers it holds.
        xs: ``(n_micro, micro_batch, ...)`` microbatched input, replicated.
        mesh: mesh carrying ``axis_name``.
    Returns:
        ``(n_micro, micro_batch, ...)`` outputs (replicated — every device
        holds the final result via a terminal all-gather of stage outputs).
    """
    n_stages = mesh.shape[axis_name]
    n_layers = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    if n_layers % n_stages != 0:
        raise ValueError(
            f"n_layers={n_layers} not divisible by pipe={n_stages}"
        )

    def _stage_block(local_params: Any, x: jnp.ndarray) -> jnp.ndarray:
        # apply this device's consecutive layer block (scan over local layers)
        def body(h, one_layer):
            return layer_fn(one_layer, h), None

        h, _ = jax.lax.scan(body, x, local_params)
        return h

    def _pipelined(local_params: Any, xs_local: jnp.ndarray) -> jnp.ndarray:
        idx = jax.lax.axis_index(axis_name)
        n_micro = xs_local.shape[0]
        total = n_micro + n_stages - 1
        fwd = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        # Bubble ticks (warmup/drain) run layer_fn on values that are never
        # recorded; feed REAL microbatch data there rather than zeros so a
        # layer_fn with a non-finite derivative at degenerate inputs
        # (eps-free norm, sqrt, x/|x|) cannot inject NaN cotangents through
        # the 0 * NaN = NaN VJP path.
        state = xs_local[0]
        outputs = jnp.zeros_like(xs_local)

        def tick(carry, t):
            state, outputs = carry
            # stage 0 ingests microbatch t (clamped re-reads during drain
            # ticks are computed but never recorded)
            feed = xs_local[jnp.minimum(t, n_micro - 1)]
            state = jnp.where(idx == 0, feed, state)
            y = _stage_block(local_params, state)
            # last stage records microbatch t-(n_stages-1)
            out_t = t - (n_stages - 1)
            rec = jnp.logical_and(idx == n_stages - 1, out_t >= 0)
            slot = jnp.clip(out_t, 0, n_micro - 1)
            outputs = jnp.where(
                rec,
                jax.lax.dynamic_update_index_in_dim(outputs, y, slot, 0),
                outputs,
            )
            # hand activations forward along the ring (stage i -> i+1);
            # the wraparound edge (last -> 0) is overwritten by ingestion.
            state = jax.lax.ppermute(y, axis_name, fwd)
            return (state, outputs), None

        (_, outputs), _ = jax.lax.scan(
            tick, (state, outputs), jnp.arange(total)
        )
        # every stage holds `outputs`, but only the last stage's is real:
        # psum after masking broadcasts it (one ICI all-reduce at the end).
        outputs = jnp.where(idx == n_stages - 1, outputs, 0.0)
        return jax.lax.psum(outputs, axis_name)

    pspec = params_in_spec
    if pspec is None:
        pspec = P(axis_name)
    in_params_specs = jax.tree_util.tree_map(
        lambda _: pspec, stacked_params
    )
    fn = shard_map(
        _pipelined,
        mesh=mesh,
        in_specs=(in_params_specs, P()),
        out_specs=P(),
        check_rep=False,
    )
    return fn(stacked_params, xs)


def pipeline_shard_params(stacked_params: Any, mesh: Mesh, axis_name: str = "pipe") -> Any:
    """Place stacked layer params on the mesh, stage axis sharded over
    ``axis_name`` (so each device stores only its own layer block)."""
    from jax.sharding import NamedSharding

    sh = NamedSharding(mesh, P(axis_name))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), stacked_params)

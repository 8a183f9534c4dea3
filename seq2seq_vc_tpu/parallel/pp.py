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
    params_in_spec: P | Any = None,
    xs_spec: P = P(),
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
    if isinstance(pspec, P):
        in_params_specs = jax.tree_util.tree_map(
            lambda _: pspec, stacked_params
        )
    else:
        # a pytree of PartitionSpecs matching stacked_params — lets layer
        # weights shard over OTHER mesh axes too (Megatron TP inside a
        # pipelined layer_fn that psums over the model axis; see
        # tests/test_pipeline_parallel.py composed DPxTPxPP case)
        in_params_specs = pspec
    fn = shard_map(
        _pipelined,
        mesh=mesh,
        in_specs=(in_params_specs, xs_spec),
        out_specs=xs_spec,
        check_rep=False,
    )
    return fn(stacked_params, xs)


def pipeline_module_stack(
    apply_fn: Callable[..., jnp.ndarray],
    layer_params: list,
    x: jnp.ndarray,
    extras: Any = None,
    bcast: Any = None,
    *,
    mesh: Mesh,
    n_micro: int,
    axis_name: str = "pipe",
    data_axis: str = "data",
) -> jnp.ndarray:
    """GPipe-pipeline a homogeneous flax layer stack over ``axis_name``,
    composed with data parallelism over ``data_axis``.

    The flax-facing variant of :func:`pipeline_apply` (used by
    ``nn.ConformerEncoder`` when ``pipe_mesh`` is set): the batch is split
    into ``n_micro`` microbatches that march through the layer blocks, each
    microbatch carrying its per-example ``extras`` (attention masks)
    through the ``ppermute`` ring alongside the activation, while ``bcast``
    (positional tables, RNG keys) is replicated to every stage.

    Args:
        apply_fn: ``(one_layer_params, x_mb, extras_mb, bcast, mb_idx,
            layer_idx) -> x_mb`` — applies ONE layer. ``mb_idx`` /
            ``layer_idx`` are traced int32 scalars (for RNG folding).
        layer_params: list of per-layer param pytrees (identical structure).
        x: ``(B, ...)`` input; ``B`` must divide by ``n_micro``, and the
            microbatch by the mesh's data-axis size.
        extras: pytree of per-example arrays (leading dim ``B``) or None.
        bcast: replicated pytree passed to every ``apply_fn`` call, or None.
    Returns:
        ``(B, ...)`` outputs, replicated over ``axis_name`` and sharded
        over ``data_axis`` like the input.

    Gradient note: parameter cotangents are psummed over every mesh axis
    the shard_map leaves unmentioned; for the data axis that IS the DP
    gradient all-reduce, but an idle model/seq axis of size > 1 would
    over-count grads by its size (check_rep=False), so those must be 1.
    """
    n_stages = mesh.shape[axis_name]
    n_layers = len(layer_params)
    if n_layers % n_stages != 0:
        raise ValueError(
            f"n_layers={n_layers} not divisible by pipe={n_stages}"
        )
    per = n_layers // n_stages
    for ax, sz in dict(mesh.shape).items():
        if ax not in (axis_name, data_axis) and sz > 1:
            raise ValueError(
                f"pipeline_module_stack composes with '{data_axis}' only; "
                f"mesh axis '{ax}' has size {sz} (> 1) and would "
                "over-count parameter gradients (check_rep=False psums "
                "cotangents over unmentioned axes)"
            )
    B = x.shape[0]
    if B % n_micro != 0:
        raise ValueError(f"batch {B} not divisible by n_micro={n_micro}")
    stacked = stack_layer_params(layer_params)

    def _split(a):
        return a.reshape((n_micro, B // n_micro) + a.shape[1:])

    xs = _split(x)
    has_extras = extras is not None
    exs = jax.tree_util.tree_map(_split, extras) if has_extras else ()
    bc = bcast if bcast is not None else ()

    def _pipelined(local_params, xs_local, exs_local, bc_local):
        idx = jax.lax.axis_index(axis_name)
        total = n_micro + n_stages - 1
        fwd = [(i, (i + 1) % n_stages) for i in range(n_stages)]
        layer_ids = idx * per + jnp.arange(per, dtype=jnp.int32)

        def _stage_block(h, ex, mb_idx):
            def body(carry, inp):
                p, lid = inp
                return apply_fn(p, carry, ex, bc_local, mb_idx, lid), None

            h, _ = jax.lax.scan(body, h, (local_params, layer_ids))
            return h

        def _take(tree, t):
            return jax.tree_util.tree_map(lambda a: a[t], tree)

        state_h = xs_local[0]
        state_ex = _take(exs_local, 0)
        state_mi = jnp.int32(0)
        outputs = jnp.zeros_like(xs_local)

        def tick(carry, t):
            (h, ex, mi), outputs = carry
            # stage 0 ingests microbatch t (clamped re-reads during drain
            # ticks run real data but are never recorded — see
            # pipeline_apply's bubble note)
            tc = jnp.minimum(t, n_micro - 1)
            is0 = idx == 0
            h = jnp.where(is0, xs_local[tc], h)
            ex = jax.tree_util.tree_map(
                lambda a, b: jnp.where(is0, a, b), _take(exs_local, tc), ex
            )
            mi = jnp.where(is0, tc, mi)
            y = _stage_block(h, ex, mi)
            out_t = t - (n_stages - 1)
            rec = jnp.logical_and(idx == n_stages - 1, out_t >= 0)
            slot = jnp.clip(out_t, 0, n_micro - 1)
            outputs = jnp.where(
                rec,
                jax.lax.dynamic_update_index_in_dim(outputs, y, slot, 0),
                outputs,
            )
            nxt = jax.lax.ppermute((y, ex, mi), axis_name, fwd)
            return (nxt, outputs), None

        ((_, _, _), outputs), _ = jax.lax.scan(
            tick, ((state_h, state_ex, state_mi), outputs), jnp.arange(total)
        )
        outputs = jnp.where(idx == n_stages - 1, outputs, 0.0)
        return jax.lax.psum(outputs, axis_name)

    mb_spec = P(None, data_axis)
    fn = shard_map(
        _pipelined,
        mesh=mesh,
        in_specs=(
            jax.tree_util.tree_map(lambda _: P(axis_name), stacked),
            mb_spec,
            jax.tree_util.tree_map(lambda _: mb_spec, exs),
            jax.tree_util.tree_map(lambda _: P(), bc),
        ),
        out_specs=mb_spec,
        check_rep=False,
    )
    out = fn(stacked, xs, exs, bc)
    return out.reshape((B,) + out.shape[2:])


def pipeline_shard_params(stacked_params: Any, mesh: Mesh, axis_name: str = "pipe") -> Any:
    """Place stacked layer params on the mesh, stage axis sharded over
    ``axis_name`` (so each device stores only its own layer block)."""
    from jax.sharding import NamedSharding

    sh = NamedSharding(mesh, P(axis_name))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), stacked_params)

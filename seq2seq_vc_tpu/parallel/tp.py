"""Tensor-parallel parameter sharding rules (GSPMD style).

Activates the mesh's ``model`` axis (``parallel/mesh.py``): parameters of
the wide transformer/conformer sublayers are sharded Megatron-style —
feed-forward expand kernels and attention q/k/v projections column-split,
the contracting feed-forward kernel and the attention output projection
row-split — as ``jax.sharding`` annotations. XLA's sharding propagation
then partitions the matmuls over the ``model`` axis and inserts the
all-reduces over ICI; no manual collectives are written (SURVEY.md §2.10:
the reference has no TP at all — this is a TPU-native extension, sized for
serving wide ``eunits``/decoder stacks rather than the small research
models).

Usage::

    mesh = get_mesh(data=2, model=4)
    specs = tp_param_specs(params, mesh)           # PartitionSpec pytree
    shardings = to_named_shardings(specs, mesh)    # device placement
    params = jax.device_put(params, shardings)
    step = jax.jit(step_fn, in_shardings=(shardings, ...), ...)

Correctness does not depend on which parameters match a rule: anything not
matched is replicated, and XLA keeps the math identical (verified by
``tests/test_tensor_parallel.py`` against a single-device run).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path-suffix, spec builder) rules. A parameter path (tuple of str keys)
# matches a rule when its trailing components equal the suffix. First match
# wins; no match -> replicated.
#
# Column-split (output features over 'model'): the following layer consumes
# the split axis as its contraction dim, so pairing each column-split with
# a row-split closes the pattern with one all-reduce per sublayer.
_COLUMN_DENSE = P(None, "model")        # Dense kernel (in, out)
_COLUMN_DENSE_BIAS = P("model")
_ROW_DENSE = P("model", None)           # Dense kernel (in, out), in split
_COLUMN_CONV1 = P(None, None, "model")  # Conv kernel (k, in, out)
_ROW_CONV1 = P(None, "model", None)


def _rules(model_size: int):
    return [
        # transformer / conformer feed-forward (linear flavor)
        (("feed_forward", "Dense_0", "kernel"), _COLUMN_DENSE),
        (("feed_forward", "Dense_0", "bias"), _COLUMN_DENSE_BIAS),
        (("feed_forward", "Dense_1", "kernel"), _ROW_DENSE),
        (("feed_forward_macaron", "Dense_0", "kernel"), _COLUMN_DENSE),
        (("feed_forward_macaron", "Dense_0", "bias"), _COLUMN_DENSE_BIAS),
        (("feed_forward_macaron", "Dense_1", "kernel"), _ROW_DENSE),
        # conv1d positionwise flavor (MultiLayeredConv1d)
        (("feed_forward", "Conv_0", "kernel"), _COLUMN_CONV1),
        (("feed_forward", "Conv_0", "bias"), _COLUMN_DENSE_BIAS),
        (("feed_forward", "Conv_1", "kernel"), _ROW_CONV1),
        (("feed_forward_macaron", "Conv_0", "kernel"), _COLUMN_CONV1),
        (("feed_forward_macaron", "Conv_0", "bias"), _COLUMN_DENSE_BIAS),
        (("feed_forward_macaron", "Conv_1", "kernel"), _ROW_CONV1),
        # attention: q/k/v/pos column-split (heads over devices), out row-split
        (("linear_q", "kernel"), _COLUMN_DENSE),
        (("linear_q", "bias"), _COLUMN_DENSE_BIAS),
        (("linear_k", "kernel"), _COLUMN_DENSE),
        (("linear_k", "bias"), _COLUMN_DENSE_BIAS),
        (("linear_v", "kernel"), _COLUMN_DENSE),
        (("linear_v", "bias"), _COLUMN_DENSE_BIAS),
        (("linear_pos", "kernel"), _COLUMN_DENSE),
        (("linear_out", "kernel"), _ROW_DENSE),
    ]


def _divisible(shape: Tuple[int, ...], spec: P, model_size: int) -> bool:
    for dim, axis in zip(shape, spec):
        if axis == "model" and dim % model_size != 0:
            return False
    return True


def tp_param_specs(params: Any, mesh: Mesh) -> Any:
    """PartitionSpec pytree for ``params``: TP rules where they apply (and
    divide evenly), replicated otherwise."""
    model_size = mesh.shape.get("model", 1)
    rules = _rules(model_size)

    def spec_for(path, leaf):
        if model_size <= 1:
            return P()
        keys = tuple(
            p.key if hasattr(p, "key") else str(p) for p in path
        )
        for suffix, spec in rules:
            if keys[-len(suffix):] == suffix and _divisible(
                tuple(leaf.shape), spec, model_size
            ):
                return spec
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def to_named_shardings(specs: Any, mesh: Mesh) -> Any:
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s),
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Place ``params`` on the mesh under the TP rules (replicated over the
    ``data`` axis, split over ``model`` where the rules apply)."""
    return jax.device_put(params, to_named_shardings(tp_param_specs(params, mesh), mesh))

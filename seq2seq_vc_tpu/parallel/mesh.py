"""Device-mesh / sharding utilities — the TPU-native replacement for the
reference's DDP stack.

The reference does data parallelism only, via NCCL process groups + apex DDP
(reference ``bin/vc_train.py:197-201,423-431``), a ``DistributedSampler``
(``:310-325``) and rank-0 gating (``trainers/base.py:139-142``). On TPU we
instead run a single program per host, build a ``jax.sharding.Mesh`` over all
devices, shard the batch over a ``data`` axis, and let pjit insert the
gradient all-reduce over ICI. ``jax.process_index() == 0`` replaces the
rank-0 gate; no launcher or rendezvous code is needed.

The mesh always carries a ``model`` axis; tensor parallelism is activated
by the Megatron-style parameter sharding rules in ``parallel/tp.py``
(``tensor_parallel: N`` in the train config) — see
``tests/test_tensor_parallel.py`` for the equivalence proof on the fake
mesh. The reference has no TP at all (SURVEY.md §2.10).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(
    data: Optional[int] = None,
    model: int = 1,
    seq: int = 1,
    pipe: int = 1,
    devices: Optional[Sequence[Any]] = None,
) -> Mesh:
    """Build a ``(data, model, seq, pipe)`` mesh over the available devices.

    Args:
        data: Size of the data axis. Defaults to
            ``n_devices // (model*seq*pipe)``.
        model: Size of the model (tensor-parallel) axis.
        seq: Size of the sequence-parallel axis (ring attention).
        pipe: Size of the pipeline-parallel axis (GPipe layer stages).
        devices: Devices to use. Defaults to ``jax.devices()``.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        data = n // (model * seq * pipe)
    if data * model * seq * pipe != n:
        raise ValueError(f"mesh {data}x{model}x{seq}x{pipe} != {n} devices")
    arr = np.asarray(devices).reshape(data, model, seq, pipe)
    return Mesh(arr, axis_names=("data", "model", "seq", "pipe"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding that splits the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (parameters, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, extra_multiple: int = 1) -> Any:
    """Place a host batch onto the mesh, batch-dim sharded over ``data``.

    Single host: one device_put lays the batch across all local devices.
    Multi host (``jax.process_count() > 1``): each process holds only its
    rows of the global batch (the DataLoader's per-process slice, padded to
    the shared global bucket) and
    ``jax.make_array_from_process_local_data`` assembles the global array —
    together these replace the reference's DistributedSampler + per-rank
    DataLoader (``bin/vc_train.py:310-325``).
    """
    sharding = data_sharding(mesh)
    multihost = jax.process_count() > 1

    # the batch dim must divide the data axis; an epoch's final partial
    # batch is padded by wrap-around repetition (the reference's
    # DistributedSampler duplicates samples the same way) — duplicated
    # rows slightly re-weight that one batch's mean loss, as there.
    data = dict(mesh.shape).get("data", 1)
    # extra_multiple: pipeline microbatch count — the global batch must
    # split into n_micro microbatches whose size divides the data axis
    # (B % (n_micro * data) == 0), so partial batches pad to that product
    mult = data * max(1, int(extra_multiple))
    leaves = jax.tree_util.tree_leaves(batch)
    if leaves and mult > 1:
        B = np.asarray(leaves[0]).shape[0]
        pad = (-B) % mult
        if pad:
            idx = np.arange(B + pad) % B
            batch = jax.tree_util.tree_map(
                lambda x: np.asarray(x)[idx], batch
            )

    def _put(x):
        x = np.asarray(x)
        if multihost:
            return jax.make_array_from_process_local_data(sharding, x)
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(_put, batch)


def is_coordinator() -> bool:
    """True on the process that should log / checkpoint (replaces rank==0)."""
    return jax.process_index() == 0

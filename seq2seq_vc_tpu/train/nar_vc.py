"""FS2-VC trainer (reference ``trainers/nar_vc.py:22-205``): L1 +
DurationPredictorLoss against teacher durations."""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from .trainer import Trainer


class NARVCTrainer(Trainer):
    def loss_fn(self, params, batch, rngs, flags, deterministic=False):
        out = self.model.apply(
            params,
            batch["xs"],
            batch["ilens"],
            batch["ys"],
            batch["olens"],
            batch["durations"],
            batch.get("duration_lens"),
            batch.get("dp_inputs"),
            batch.get("dplens"),
            deterministic=deterministic,
            rngs=rngs,
        )
        l1 = self.criterion["L1Loss"](
            out["after_outs"], out["before_outs"], out["ys"], out["olens"]
        )
        # teacher durations are frame counts; predictor output is log-domain.
        # align the separately-padded duration tensor to the predictor grid
        ds = jnp.asarray(batch["durations"])
        T_d = out["d_outs"].shape[1]
        if ds.shape[1] >= T_d:
            ds = ds[:, :T_d]
        else:
            ds = jnp.pad(ds, ((0, 0), (0, T_d - ds.shape[1])))
        dur = self.criterion["DurationPredictorLoss"](out["d_outs"], ds, out["ilens"])
        return l1 + dur, {"l1_loss": l1, "duration_loss": dur}

"""AR VC trainer (reference ``trainers/ar_vc.py:28-221``): Seq2SeqLoss
(L1 + stop BCE) + optional guided attention, plus intermediate dev-sample
generation with mel/attention plots."""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..models import VTN
from .trainer import Trainer


class ARVCTrainer(Trainer):
    def loss_fn(self, params, batch, rngs, flags, deterministic=False):
        out = self.model.apply(
            params,
            batch["xs"],
            batch["ilens"],
            batch["ys"],
            batch["labels"],
            batch["olens"],
            deterministic=deterministic,
            rngs=rngs,
        )
        l1_loss, bce_loss = self.criterion["Seq2SeqLoss"](
            out["after_outs"],
            out["before_outs"],
            out["logits"],
            out["ys"],
            out["labels"],
            out["olens"],
        )
        loss = l1_loss + bce_loss
        metrics = {"l1_loss": l1_loss, "bce_loss": bce_loss}
        ga = self.criterion.get("guided_attn")
        if ga is not None and self.config.get("use_guided_attn_loss", False):
            att = out["att_ws"]  # (L, B, H, T_out, T_in)
            L, B, H, To, Ti = att.shape
            att = att.transpose(1, 0, 2, 3, 4).reshape(B, L * H, To, Ti)
            ga_loss = ga(att, out["ilens_ds_st"], out["olens_in"])
            loss = loss + ga_loss
            metrics["guided_attn_loss"] = ga_loss
        return loss, metrics

    def generate_intermediate(self, batch, outdir: str):
        os.makedirs(outdir, exist_ok=True)
        n = min(
            self.config.get("num_save_intermediate_results", 4), len(batch["xs"])
        )
        xs = batch["xs"][:n]
        ilens = batch["ilens"][:n]
        inference = getattr(type(self.model), "inference")
        inf_cfg = self.config.get("inference", {}) or {}
        key = ("intermediate", xs.shape)
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(
                lambda p, xs, ilens, k: self.model.apply(
                    p, xs, ilens, k,
                    inf_cfg.get("threshold", 0.5),
                    inf_cfg.get("minlenratio", 0.0),
                    inf_cfg.get("maxlenratio", 6.0),
                    method=inference,
                )
            )
        out = self._jit_cache[key](
            self.state.params, jnp.asarray(xs), jnp.asarray(ilens), jax.random.PRNGKey(0)
        )
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            for i in range(n):
                utt = batch["utt_ids"][i]
                L = int(out["out_lens"][i])
                fig, axes = plt.subplots(3, 1, figsize=(8, 8))
                axes[0].imshow(
                    np.asarray(batch["ys"][i, : batch["olens"][i]]).T,
                    aspect="auto", origin="lower",
                )
                axes[0].set_title("groundtruth")
                axes[1].imshow(
                    np.asarray(out["outs"][i, :L]).T, aspect="auto", origin="lower"
                )
                axes[1].set_title("generated")
                axes[2].plot(np.asarray(out["probs"][i, :L]))
                axes[2].set_title("stop probs")
                fig.tight_layout()
                fig.savefig(os.path.join(outdir, f"{utt}.png"))
                plt.close(fig)
        except Exception:  # pragma: no cover - plotting is best-effort
            pass

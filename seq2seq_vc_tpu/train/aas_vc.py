"""AAS-VC trainer (reference ``trainers/aas_vc.py:22-286``): L1 +
lambda_align * (ForwardSum + binarization) + duration loss gated by
``dp_train_start_steps``.

The forward-sum prior depends only on lengths, so it is computed host-side
in the loss (cached) while MAS, CTC, and everything else stay on device in
the jitted step. Gradient accumulation is handled by optax.MultiSteps in
the optimizer chain.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from .trainer import Trainer


class AASVCTrainer(Trainer):
    def _flags(self):
        # static flag: whether the duration-predictor loss is active
        return (self.steps >= self.config.get("dp_train_start_steps", 0),)

    def _reduced_lengths(self, batch):
        """Host-side replica of the model's length reductions (needed to
        build the beta-binomial prior outside jit)."""
        m = self.model
        ilens = batch["ilens"].astype(np.int64)
        t_text = batch["xs"].shape[1]
        er = getattr(m, "encoder_reduction_factor", 1)
        pr = getattr(m, "post_encoder_reduction_factor", 1)
        dr = getattr(m, "decoder_reduction_factor", 1)
        ilens = ilens // er
        t_text = t_text // er
        if getattr(m, "encoder_input_layer", "linear") == "conv2d":
            ilens = ((ilens - 2 + 1) // 2 - 2 + 1) // 2
            t_text = ((t_text - 2 + 1) // 2 - 2 + 1) // 2
        ilens = ilens // pr
        t_text = t_text // pr
        olens = batch["olens"].astype(np.int64) // dr
        t_feats = batch["ys"].shape[1] // dr
        return ilens, olens, t_text, t_feats

    def _array_batch(self, batch):
        from ..ops.forward_sum import beta_binomial_prior

        ilens_r, olens_r, t_text, t_feats = self._reduced_lengths(batch)
        batch = dict(batch)
        batch["bb_prior"] = beta_binomial_prior(ilens_r, olens_r, t_text, t_feats)
        return super()._array_batch(batch)

    def loss_fn(self, params, batch, rngs, flags, deterministic=False):
        (dp_active,) = flags
        out = self.model.apply(
            params,
            batch["xs"],
            batch["ilens"],
            batch["ys"],
            batch["olens"],
            batch.get("dp_inputs"),
            batch.get("dplens"),
            deterministic=deterministic,
            rngs=rngs,
        )
        metrics: Dict[str, Any] = {}
        loss = 0.0
        if "L1Loss" in self.criterion:
            l1 = self.criterion["L1Loss"](
                out["after_outs"], out["before_outs"], out["ys"], out["olens"]
            )
            loss = loss + l1
            metrics["l1_loss"] = l1

        if "DiffSingerL2Loss" in self.criterion:
            # diffusion decoder: masked L2 between injected and predicted
            # noise on the reduced frame grid (reference trainers/
            # aas_vc.py:89-98)
            l2 = self.criterion["DiffSingerL2Loss"](
                out["noise"], out["x_recon"], out["olens_reduced"]
            )
            loss = loss + l2
            metrics["diffsinger_l2_loss"] = l2

        from ..ops.forward_sum import forward_sum_loss

        fsum = forward_sum_loss(
            out["log_p_attn"] + batch["bb_prior"],
            out["ilens"],
            out["olens_reduced"],
        )
        bin_loss = out["bin_loss"]
        lam = self.config.get("lambda_align", 2.0)
        loss = loss + lam * (fsum + bin_loss)
        metrics["forward_sum_loss"] = fsum
        metrics["binary_loss"] = bin_loss

        if dp_active:
            if "DurationPredictorLoss" in self.criterion:
                dur = self.criterion["DurationPredictorLoss"](
                    out["d_outs"], out["ds"], out["ilens"]
                )
            else:  # stochastic: NLL already computed in the forward pass
                dur = out["dur_nll"]
            loss = loss + dur
            metrics["duration_loss"] = dur
        return loss, metrics

    def generate_intermediate(self, batch, outdir: str):
        os.makedirs(outdir, exist_ok=True)
        n = min(self.config.get("num_save_intermediate_results", 4), len(batch["xs"]))
        xs = batch["xs"][:n]
        ilens = batch["ilens"][:n]
        dp = batch["dp_inputs"][:n] if "dp_inputs" in batch else None
        inference = getattr(type(self.model), "inference")
        max_out = int(xs.shape[1] * 2) + 8
        key = ("intermediate", xs.shape, dp is None)
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(
                lambda p, xs, ilens, dp, k: self.model.apply(
                    p, xs, ilens, dp, max_output_frames=max_out,
                    method=inference, rngs={"noise": k},
                )
            )
        out = self._jit_cache[key](
            self.state.params, jnp.asarray(xs), jnp.asarray(ilens),
            None if dp is None else jnp.asarray(dp), jax.random.PRNGKey(0),
        )
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            for i in range(n):
                utt = batch["utt_ids"][i]
                L = int(out["out_lens"][i])
                fig, axes = plt.subplots(2, 1, figsize=(8, 6))
                axes[0].imshow(
                    np.asarray(batch["ys"][i, : batch["olens"][i]]).T,
                    aspect="auto", origin="lower",
                )
                axes[0].set_title("groundtruth")
                axes[1].imshow(
                    np.asarray(out["outs"][i, :L]).T, aspect="auto", origin="lower"
                )
                axes[1].set_title("generated")
                fig.tight_layout()
                fig.savefig(os.path.join(outdir, f"{utt}.png"))
                plt.close(fig)
        except Exception:  # pragma: no cover
            pass

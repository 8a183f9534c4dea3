"""AR TTS trainer (reference ``trainers/ar_tts.py:22-181``): same loss
assembly as AR VC, token inputs instead of mel."""

from __future__ import annotations

from .ar_vc import ARVCTrainer


class ARTTSTrainer(ARVCTrainer):
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
            # TransformerTTS already concatenates selected heads: (B, H*L, To, Ti)
            ga_loss = ga(out["att_ws"], out["ilens"], out["olens_in"])
            loss = loss + ga_loss
            metrics["guided_attn_loss"] = ga_loss
        return loss, metrics

"""Voice Transformer Network (AR mel-to-mel seq2seq VC).

Capability match with reference ``models/vtn.py:14-602``: conv2d-subsampled
transformer (or conformer) encoder, Tacotron prenet + transformer decoder
with reduction factor r, feat/prob heads, conv postnet, speaker-embedding
integration, guided-attention outputs.

TPU-first redesign of inference (reference ``vtn.py:302-394`` decodes one
python-loop step at a time, recomputing each layer over the whole prefix):
here decoding is a single jitted ``lax.scan`` over a static maximum length
(scan, not while_loop: large-carry while_loops hang on the axon TPU
runtime — see CLAUDE.md rule 3) with per-layer fixed-size KV caches,
batched, with per-item stop thresholds / min/max length ratios; host-side
early exit across scan chunks is provided by ``models/ar_driver.py``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.conformer import ConformerEncoder
from ..nn.pre_postnets import Postnet, Prenet
from ..nn.transformer import Decoder, Encoder
from ..ops.masks import make_non_pad_mask, target_mask
from .chunked_decode import ChunkedARDecodeMixin


def _resolve_conformer_types(rel_pos_type: str, pos_enc: str, self_attn: str):
    """Reference compatibility fallback (``vtn.py:84-105``)."""
    if rel_pos_type == "legacy":
        if pos_enc == "rel_pos":
            pos_enc = "legacy_rel_pos"
        if self_attn == "rel_selfattn":
            self_attn = "legacy_rel_selfattn"
    elif rel_pos_type != "latest":
        raise ValueError(f"unknown rel_pos_type: {rel_pos_type}")
    return pos_enc, self_attn


class VTN(ChunkedARDecodeMixin, nn.Module):
    idim: int
    odim: int
    dprenet_layers: int = 2
    dprenet_units: int = 256
    adim: int = 384
    aheads: int = 4
    encoder_type: str = "transformer"
    decoder_type: str = "transformer"
    elayers: int = 6
    eunits: int = 1536
    dlayers: int = 6
    dunits: int = 1536
    postnet_layers: int = 5
    postnet_filts: int = 5
    postnet_chans: int = 256
    positionwise_layer_type: str = "linear"
    positionwise_conv_kernel_size: int = 1
    dprenet_dropout_rate: float = 0.5
    transformer_enc_dropout_rate: float = 0.1
    transformer_enc_positional_dropout_rate: float = 0.1
    transformer_enc_attn_dropout_rate: float = 0.1
    transformer_dec_dropout_rate: float = 0.1
    transformer_dec_positional_dropout_rate: float = 0.1
    transformer_dec_attn_dropout_rate: float = 0.1
    use_batch_norm: bool = True
    encoder_normalize_before: bool = True
    decoder_normalize_before: bool = False
    encoder_concat_after: bool = False
    decoder_concat_after: bool = False
    decoder_reduction_factor: int = 2
    encoder_input_layer: str = "conv2d-scaled-pos-enc"
    spk_embed_dim: Optional[int] = None
    spk_embed_integration_type: str = "add"
    initial_encoder_alpha: float = 1.0
    initial_decoder_alpha: float = 1.0
    use_guided_attn_loss: bool = False
    num_heads_applied_guided_attn: int = 2
    num_layers_applied_guided_attn: int = 2
    conformer_rel_pos_type: str = "legacy"
    conformer_pos_enc_layer_type: str = "rel_pos"
    conformer_self_attn_layer_type: str = "rel_selfattn"
    use_macaron_style_in_conformer: bool = True
    use_cnn_in_conformer: bool = True
    zero_triu: bool = False
    conformer_enc_kernel_size: int = 7
    conformer_dec_kernel_size: int = 31
    init_type: str = "xavier_uniform"  # accepted for config parity
    # 'group_norm' (TPU default) or 'batch_norm' (reference torch parity;
    # eval uses 'batch_stats' running stats, e.g. converted checkpoints)
    conformer_conv_norm_type: str = "group_norm"
    postnet_norm_type: str = "group_norm"
    attention_backend: str = "xla"  # 'flash': Pallas kernel in the encoder
    # mixed precision: 'bfloat16' runs encoder/decoder stacks (incl. the AR
    # decode step + KV caches) with a bf16 residual stream; params, LN
    # statistics, attention scores/softmax and losses stay fp32.
    compute_dtype: str = "float32"

    @property
    def _dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else None

    def setup(self):
        if self.encoder_type == "transformer":
            self.encoder = Encoder(
                idim=self.idim,
                attention_dim=self.adim,
                attention_heads=self.aheads,
                linear_units=self.eunits,
                num_blocks=self.elayers,
                input_layer=self.encoder_input_layer,
                pos_enc_type="scaled",
                normalize_before=self.encoder_normalize_before,
                concat_after=self.encoder_concat_after,
                positionwise_layer_type=self.positionwise_layer_type,
                positionwise_conv_kernel_size=self.positionwise_conv_kernel_size,
                dropout_rate=self.transformer_enc_dropout_rate,
                positional_dropout_rate=self.transformer_enc_positional_dropout_rate,
                attention_dropout_rate=self.transformer_enc_attn_dropout_rate,
                init_enc_alpha=self.initial_encoder_alpha,
                attention_backend=self.attention_backend,
                dtype=self._dtype,
            )
        elif self.encoder_type == "conformer":
            pos_enc, self_attn = _resolve_conformer_types(
                self.conformer_rel_pos_type,
                self.conformer_pos_enc_layer_type,
                self.conformer_self_attn_layer_type,
            )
            self.encoder = ConformerEncoder(
                idim=self.idim,
                attention_dim=self.adim,
                attention_heads=self.aheads,
                linear_units=self.eunits,
                num_blocks=self.elayers,
                input_layer="conv2d",
                normalize_before=self.encoder_normalize_before,
                concat_after=self.encoder_concat_after,
                positionwise_layer_type=self.positionwise_layer_type,
                positionwise_conv_kernel_size=self.positionwise_conv_kernel_size,
                dropout_rate=self.transformer_enc_dropout_rate,
                positional_dropout_rate=self.transformer_enc_positional_dropout_rate,
                attention_dropout_rate=self.transformer_enc_attn_dropout_rate,
                macaron_style=self.use_macaron_style_in_conformer,
                pos_enc_layer_type=pos_enc,
                selfattention_layer_type=self_attn,
                use_cnn_module=self.use_cnn_in_conformer,
                cnn_module_kernel=self.conformer_enc_kernel_size,
                conv_norm_type=self.conformer_conv_norm_type,
                zero_triu=self.zero_triu,
                dtype=self._dtype,
            )
        else:
            raise NotImplementedError(self.encoder_type)

        if self.spk_embed_dim is not None:
            self.projection = nn.Dense(self.adim)

        self.dprenet = Prenet(
            idim=self.odim,
            n_layers=self.dprenet_layers,
            n_units=self.dprenet_units,
            dropout_rate=self.dprenet_dropout_rate,
        )
        self.dprenet_proj = nn.Dense(self.adim)

        self.decoder = Decoder(
            odim=-1,
            attention_dim=self.adim,
            attention_heads=self.aheads,
            linear_units=self.dunits,
            num_blocks=self.dlayers,
            dropout_rate=self.transformer_dec_dropout_rate,
            positional_dropout_rate=self.transformer_dec_positional_dropout_rate,
            self_attention_dropout_rate=self.transformer_dec_attn_dropout_rate,
            src_attention_dropout_rate=self.transformer_dec_attn_dropout_rate,
            input_layer=None,
            use_output_layer=False,
            pos_enc_type="scaled",
            normalize_before=self.decoder_normalize_before,
            concat_after=self.decoder_concat_after,
            init_dec_alpha=self.initial_decoder_alpha,
            dtype=self._dtype,
        )

        r = self.decoder_reduction_factor
        self.feat_out = nn.Dense(self.odim * r)
        self.prob_out = nn.Dense(r)
        self.postnet = Postnet(
            odim=self.odim,
            n_layers=self.postnet_layers,
            n_chans=self.postnet_chans,
            n_filts=self.postnet_filts,
            use_norm=self.use_batch_norm,
            norm_type=self.postnet_norm_type,
        )

    def _integrate_with_spk_embed(self, hs, spembs):
        spembs = spembs / jnp.maximum(
            jnp.linalg.norm(spembs, axis=-1, keepdims=True), 1e-12
        )
        if self.spk_embed_integration_type == "add":
            return hs + self.projection(spembs)[:, None, :]
        if self.spk_embed_integration_type == "concat":
            tiled = jnp.broadcast_to(
                spembs[:, None, :], hs.shape[:2] + (spembs.shape[-1],)
            )
            return self.projection(jnp.concatenate([hs, tiled], axis=-1))
        raise NotImplementedError(self.spk_embed_integration_type)

    def encode(self, xs, ilens, spembs=None, deterministic: bool = True):
        x_masks = make_non_pad_mask(ilens, xs.shape[1])
        hs, h_masks = self.encoder(xs, x_masks, deterministic=deterministic)
        if self.spk_embed_dim is not None:
            hs = self._integrate_with_spk_embed(hs, spembs)
        return hs, h_masks

    def __call__(
        self,
        xs,
        ilens,
        ys,
        labels,
        olens,
        spembs=None,
        deterministic: bool = False,
    ) -> Dict[str, Any]:
        """Teacher-forcing forward (reference ``vtn.py:207-300``).

        Args:
            xs: (B, Tin, idim) source features.
            ilens: (B,) source lengths.
            ys: (B, Lmax, odim) target features; Lmax must be a multiple of
                the decoder reduction factor (pad accordingly).
            labels: (B, Lmax) stop labels.
            olens: (B,) target lengths.
        """
        r = self.decoder_reduction_factor
        B, Lmax, _ = ys.shape
        assert Lmax % r == 0, "pad target length to a multiple of the reduction factor"

        hs, h_masks = self.encode(xs, ilens, spembs, deterministic=deterministic)

        # thin out frames: take every r-th (the last of each group)
        ys_in = ys[:, r - 1 :: r]
        olens_in = olens // r
        # shift right for AR
        ys_in = jnp.concatenate(
            [jnp.zeros_like(ys_in[:, :1]), ys_in[:, :-1]], axis=1
        )

        y_masks = target_mask(olens_in, ys_in.shape[1])
        tgt = self.dprenet_proj(self.dprenet(ys_in))
        zs, _, src_ws = self.decoder(
            tgt, y_masks, hs, h_masks, deterministic=deterministic, return_attns=True
        )
        before_outs = self.feat_out(zs).reshape(B, -1, self.odim)
        logits = self.prob_out(zs).reshape(B, -1)
        after_outs = before_outs + self.postnet(before_outs, deterministic=deterministic)

        # adjust target lengths / stop labels for the truncated mod part
        # (reference vtn.py:262-274)
        olens_adj = olens - olens % r
        pos = jnp.arange(Lmax)[None, :]
        labels_adj = jnp.where(pos == (olens_adj - 1)[:, None], 1.0, labels)

        # subsampled source lengths for guided attention (reference vtn.py:277)
        if getattr(self.encoder, "conv_subsampling_factor", 1) == 4:
            ilens_ds = ((ilens - 2 + 1) // 2 - 2 + 1) // 2
        else:
            ilens_ds = ilens

        return {
            "after_outs": after_outs,
            "before_outs": before_outs,
            "logits": logits,
            "ys": ys,
            "labels": labels_adj,
            "olens": olens_adj,
            "att_ws": jnp.stack(src_ws),  # (L, B, H, Lmax//r, Tmem)
            "ilens_ds_st": ilens_ds,
            "olens_in": olens_in,
        }

    def inference(
        self,
        xs,
        ilens,
        rng,
        threshold: float = 0.5,
        minlenratio: float = 0.0,
        maxlenratio: float = 10.0,
        spembs=None,
    ) -> Dict[str, Any]:
        """Batched jitted AR decode (replaces reference ``vtn.py:302-394``).

        A ``lax.scan`` over the static maximum step count with per-layer KV
        caches in the carry; per-step outputs (frames, stop probs, attention
        rows) are collected as scan outputs, so no O(maxlen) buffers ride in
        the carry. Per-item stop thresholds / min/max lengths produce
        ``out_lens``; frames generated past an item's stop are masked out by
        the caller via ``out_lens``.

        Returns dict with
            outs: (B, MAXLEN*r, odim) postnet-refined features,
            probs: (B, MAXLEN*r) stop probabilities,
            out_lens: (B,) number of valid output frames,
            att_ws: (L, B, H, MAXLEN, Tmem) cross-attention maps.
        """
        r = self.decoder_reduction_factor
        B = xs.shape[0]
        hs, h_masks = self.encode(xs, ilens, spembs, deterministic=True)
        t_mem = hs.shape[1]
        hlens = h_masks.sum(-1) if h_masks is not None else jnp.full((B,), t_mem)

        maxlen = max(int(t_mem * maxlenratio / r), 1)
        maxlen_b = jnp.maximum((hlens * maxlenratio // r).astype(jnp.int32), 1)
        minlen_b = (hlens * minlenratio // r).astype(jnp.int32)

        cache = self.decoder.init_cache(B, maxlen)
        mem_kv = self.decoder.precompute_memory(hs)

        init = (
            jnp.zeros((B, 1, self.odim)),  # y_prev
            cache,
            jnp.zeros((B,), bool),  # finished
            jnp.zeros((B,), jnp.int32),  # out_len
            rng,
        )

        body = self._decode_body(r, B, threshold, minlen_b, maxlen_b, mem_kv, h_masks)
        (_, _, finished, out_len, _), (outs, probs, att) = jax.lax.scan(
            body, init, jnp.arange(maxlen)
        )
        # outs: (maxlen, B, r, odim) -> (B, maxlen*r, odim)
        outs = outs.transpose(1, 0, 2, 3).reshape(B, maxlen * r, self.odim)
        out_len = jnp.where(finished, out_len, maxlen_b)
        # mask the dead tail (frames generated past each item's stop) to
        # zero before the postnet convs — the reference postnet sees
        # exactly the generated frames (vtn.py:382-388), so its conv
        # padding past the stop is zeros, not dead frames
        outs = self.decode_postnet(outs, out_len * r)
        # att: (maxlen, L, B, H, Tmem) -> (L, B, H, maxlen, Tmem)
        att = att.transpose(1, 2, 3, 0, 4)
        return {
            "outs": outs,
            "probs": probs.transpose(1, 0, 2).reshape(B, maxlen * r),
            "out_lens": out_len * r,
            "att_ws": att,
        }

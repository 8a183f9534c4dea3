"""Transformer-TTS (text -> mel) for LJSpeech pretraining.

Capability match with reference ``models/transformer_tts.py:13-534``:
embedding encoder with eos append (eos id = idim - 1, padding id 0),
otherwise the same prenet/decoder/feat_out/prob_out/postnet stack as VTN —
and the same TPU-first while_loop inference.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.pre_postnets import Postnet, Prenet
from ..nn.transformer import Decoder, Encoder
from ..ops.masks import make_non_pad_mask, target_mask
from .chunked_decode import ChunkedARDecodeMixin


class TransformerTTS(ChunkedARDecodeMixin, nn.Module):
    idim: int  # vocabulary size (eos = idim - 1)
    odim: int
    embed_dim: int = 512  # accepted for config parity (embedding is adim-sized)
    dprenet_layers: int = 2
    dprenet_units: int = 256
    adim: int = 384
    aheads: int = 4
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
    decoder_reduction_factor: int = 1
    spk_embed_dim: Optional[int] = None
    spk_embed_integration_type: str = "add"
    initial_encoder_alpha: float = 1.0
    initial_decoder_alpha: float = 1.0
    use_guided_attn_loss: bool = False
    num_heads_applied_guided_attn: int = 2
    num_layers_applied_guided_attn: int = 2
    init_type: str = "xavier_uniform"
    # 'group_norm' (TPU default) or 'batch_norm' (reference torch parity)
    postnet_norm_type: str = "group_norm"

    @property
    def padding_idx(self) -> int:
        return 0

    @property
    def eos(self) -> int:
        return self.idim - 1

    def setup(self):
        self.encoder = Encoder(
            idim=self.idim,
            attention_dim=self.adim,
            attention_heads=self.aheads,
            linear_units=self.eunits,
            num_blocks=self.elayers,
            input_layer="embed",
            pos_enc_type="scaled",
            normalize_before=self.encoder_normalize_before,
            concat_after=self.encoder_concat_after,
            positionwise_layer_type=self.positionwise_layer_type,
            positionwise_conv_kernel_size=self.positionwise_conv_kernel_size,
            dropout_rate=self.transformer_enc_dropout_rate,
            positional_dropout_rate=self.transformer_enc_positional_dropout_rate,
            attention_dropout_rate=self.transformer_enc_attn_dropout_rate,
            init_enc_alpha=self.initial_encoder_alpha,
            padding_idx=self.padding_idx,
        )
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
        tiled = jnp.broadcast_to(spembs[:, None, :], hs.shape[:2] + (spembs.shape[-1],))
        return self.projection(jnp.concatenate([hs, tiled], axis=-1))

    def _add_eos(self, xs, ilens):
        """Append eos at position ilens[b] (reference ``transformer_tts.py:138-142``).

        xs: (B, Tmax) int tokens; output (B, Tmax + 1)."""
        B, T = xs.shape
        xs = jnp.pad(xs, ((0, 0), (0, 1)), constant_values=self.padding_idx)
        pos = jnp.arange(T + 1)[None, :]
        xs = jnp.where(pos == ilens[:, None], self.eos, xs)
        return xs, ilens + 1

    def encode(self, xs, ilens, spembs=None, deterministic: bool = True):
        xs, ilens = self._add_eos(xs, ilens)
        x_masks = make_non_pad_mask(ilens, xs.shape[1])
        hs, h_masks = self.encoder(xs, x_masks, deterministic=deterministic)
        if self.spk_embed_dim is not None:
            hs = self._integrate_with_spk_embed(hs, spembs)
        return hs, h_masks

    def __call__(
        self, xs, ilens, ys, labels, olens, spembs=None, deterministic: bool = False
    ) -> Dict[str, Any]:
        """Teacher-forcing forward. xs: (B, Tmax) int tokens."""
        r = self.decoder_reduction_factor
        B, Lmax, _ = ys.shape
        assert Lmax % r == 0, "pad target length to a multiple of the reduction factor"

        hs, h_masks = self.encode(xs, ilens, spembs, deterministic=deterministic)

        ys_in = ys[:, r - 1 :: r] if r > 1 else ys
        olens_in = olens // r
        ys_in = jnp.concatenate([jnp.zeros_like(ys_in[:, :1]), ys_in[:, :-1]], axis=1)

        y_masks = target_mask(olens_in, ys_in.shape[1])
        tgt = self.dprenet_proj(self.dprenet(ys_in))
        zs, _, src_ws = self.decoder(
            tgt, y_masks, hs, h_masks, deterministic=deterministic, return_attns=True
        )
        before_outs = self.feat_out(zs).reshape(B, -1, self.odim)
        logits = self.prob_out(zs).reshape(B, -1)
        after_outs = before_outs + self.postnet(before_outs, deterministic=deterministic)

        olens_adj = olens - olens % r
        pos = jnp.arange(Lmax)[None, :]
        labels_adj = jnp.where(pos == (olens_adj - 1)[:, None], 1.0, labels)

        # guided attention selection: last N layers, first H heads
        # (reference transformer_tts.py:205-218)
        sel = src_ws[-self.num_layers_applied_guided_attn :]
        att_ws = jnp.concatenate(
            [w[:, : self.num_heads_applied_guided_attn] for w in sel], axis=1
        )  # (B, H*L, T_out, T_in)

        return {
            "after_outs": after_outs,
            "before_outs": before_outs,
            "logits": logits,
            "ys": ys,
            "labels": labels_adj,
            "olens": olens_adj,
            "att_ws": att_ws,
            "ilens": ilens + 1,  # with eos
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
        """Batched jitted AR decode (same machinery as VTN.inference)."""
        r = self.decoder_reduction_factor
        B = xs.shape[0]
        hs, h_masks = self.encode(xs, ilens, spembs, deterministic=True)
        t_mem = hs.shape[1]
        hlens = h_masks.sum(-1)

        maxlen = max(int(t_mem * maxlenratio / r), 1)
        maxlen_b = jnp.maximum((hlens * maxlenratio // r).astype(jnp.int32), 1)
        minlen_b = (hlens * minlenratio // r).astype(jnp.int32)

        cache = self.decoder.init_cache(B, maxlen)
        mem_kv = self.decoder.precompute_memory(hs)

        init = (
            jnp.zeros((B, 1, self.odim)),
            cache,
            jnp.zeros((B,), bool),
            jnp.zeros((B,), jnp.int32),
            rng,
        )

        body = self._decode_body(
            r, B, threshold, minlen_b, maxlen_b, mem_kv, h_masks
        )
        (_, _, finished, out_len, _), (outs, probs, att) = jax.lax.scan(
            body, init, jnp.arange(maxlen)
        )
        outs = outs.transpose(1, 0, 2, 3).reshape(B, maxlen * r, self.odim)
        out_len = jnp.where(finished, out_len, maxlen_b)
        # zero the dead tail before the postnet convs (see
        # ChunkedARDecodeMixin.decode_postnet — reference-parity masking)
        outs = self.decode_postnet(outs, out_len * r)
        att = att.transpose(1, 2, 3, 0, 4)
        return {
            "outs": outs,
            "probs": probs.transpose(1, 0, 2).reshape(B, maxlen * r),
            "out_lens": out_len * r,
            "att_ws": att,
        }

"""FastSpeech-style NAR VC trained on teacher durations.

Capability match with reference ``models/fastspeech_vc.py:21-513``:
conv2d-subsampled transformer (or conformer) encoder, deterministic
duration predictor, hard repeat-interleave length regulation scaled by the
teacher model's decoder reduction factor, encoder-as-decoder, feat_out,
postnet. Teacher durations come from an AR model's teacher-forcing decode
(reference ``bin/vc_decode.py:356-360``).

The length regulator is the fixed-shape cumsum-gather op
(``ops/upsampling.py``) so training and inference both jit.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..nn.conformer import ConformerEncoder
from ..nn.conv import sp_safe_convs
from ..nn.duration_predictor import DurationPredictor
from ..nn.pre_postnets import Postnet
from ..nn.transformer import Conv2dSubsampling, Encoder
from ..ops.masks import make_non_pad_mask
from ..ops.upsampling import length_regulator
from .common import conv2d_subsampled_lengths, nearest_interpolate, reduce_frames


class FastSpeechVC(nn.Module):
    idim: int
    odim: int
    adim: int = 384
    aheads: int = 4
    elayers: int = 6
    eunits: int = 1536
    dlayers: int = 6
    dunits: int = 1536
    postnet_layers: int = 5
    postnet_chans: int = 512
    postnet_filts: int = 5
    positionwise_layer_type: str = "conv1d"
    positionwise_conv_kernel_size: int = 1
    use_scaled_pos_enc: bool = True
    use_batch_norm: bool = True
    encoder_input_layer: str = "linear"
    encoder_normalize_before: bool = False
    decoder_normalize_before: bool = False
    encoder_concat_after: bool = False
    decoder_concat_after: bool = False
    duration_predictor_use_encoder_outputs: bool = True
    duration_predictor_input_dim: Optional[int] = None
    duration_predictor_layers: int = 2
    duration_predictor_chans: int = 384
    duration_predictor_kernel_size: int = 3
    encoder_reduction_factor: int = 1
    decoder_reduction_factor: int = 1
    encoder_type: str = "transformer"
    decoder_type: str = "transformer"
    # reference FastSpeechVC has no rel_pos_type fallback either (see
    # models/aas_vc.py note): conformer options are NEW style
    conformer_rel_pos_type: str = "latest"
    conformer_pos_enc_layer_type: str = "rel_pos"
    conformer_self_attn_layer_type: str = "rel_selfattn"
    use_macaron_style_in_conformer: bool = True
    use_cnn_in_conformer: bool = True
    conformer_enc_kernel_size: int = 7
    conformer_dec_kernel_size: int = 31
    spk_embed_dim: Optional[int] = None
    spk_embed_integration_type: str = "add"
    transformer_enc_dropout_rate: float = 0.1
    transformer_enc_positional_dropout_rate: float = 0.1
    transformer_enc_attn_dropout_rate: float = 0.1
    transformer_dec_dropout_rate: float = 0.1
    transformer_dec_positional_dropout_rate: float = 0.1
    transformer_dec_attn_dropout_rate: float = 0.1
    duration_predictor_dropout_rate: float = 0.1
    postnet_dropout_rate: float = 0.5
    init_type: str = "xavier_uniform"
    # 'group_norm' (TPU default) or 'batch_norm' (reference torch parity)
    conformer_conv_norm_type: str = "group_norm"
    postnet_norm_type: str = "group_norm"
    attention_backend: str = "xla"  # 'flash': Pallas kernels (legacy + latest rel-pos)
    init_enc_alpha: float = 1.0
    init_dec_alpha: float = 1.0
    use_masking: bool = False
    use_weighted_masking: bool = False
    teacher_model_decoder_reduction_factor: int = 4
    # sequence parallelism: mesh whose 'seq' axis shards the conformer time
    # axes with ring attention (set by vc_train from the sequence_parallel
    # config key) — conformer encoder/decoder only
    sp_mesh: Any = None
    sp_axis: str = "seq"
    # pipeline parallelism: mesh whose 'pipe' axis GPipe-shards the
    # conformer layer stacks (set by vc_train from the pipeline_parallel
    # config key); composes with data parallelism only — see
    # parallel/pp.pipeline_module_stack
    pipe_mesh: Any = None
    pipe_microbatches: int = 0

    def setup(self):
        if self.sp_mesh is not None and (
            self.encoder_type != "conformer" or self.decoder_type != "conformer"
        ):
            raise NotImplementedError(
                "sequence_parallel requires conformer encoder and decoder"
            )
        pos_enc, self_attn = self._conformer_types()
        if self.encoder_type == "transformer":
            self.encoder = Encoder(
                idim=self.idim,
                attention_dim=self.adim,
                attention_heads=self.aheads,
                linear_units=self.eunits,
                num_blocks=self.elayers,
                input_layer="conv2d-scaled-pos-enc",
                pos_enc_type="scaled",
                normalize_before=self.encoder_normalize_before,
                concat_after=self.encoder_concat_after,
                positionwise_layer_type=self.positionwise_layer_type,
                positionwise_conv_kernel_size=self.positionwise_conv_kernel_size,
                dropout_rate=self.transformer_enc_dropout_rate,
                init_enc_alpha=self.init_enc_alpha,
            )
        elif self.encoder_type == "conformer":
            self.encoder = ConformerEncoder(
                idim=self.idim * self.encoder_reduction_factor,
                attention_dim=self.adim,
                attention_heads=self.aheads,
                linear_units=self.eunits,
                num_blocks=self.elayers,
                input_layer=self.encoder_input_layer,
                dropout_rate=self.transformer_enc_dropout_rate,
                positional_dropout_rate=self.transformer_enc_positional_dropout_rate,
                attention_dropout_rate=self.transformer_enc_attn_dropout_rate,
                normalize_before=self.encoder_normalize_before,
                concat_after=self.encoder_concat_after,
                positionwise_layer_type=self.positionwise_layer_type,
                positionwise_conv_kernel_size=self.positionwise_conv_kernel_size,
                macaron_style=self.use_macaron_style_in_conformer,
                pos_enc_layer_type=pos_enc,
                selfattention_layer_type=self_attn,
                use_cnn_module=self.use_cnn_in_conformer,
                cnn_module_kernel=self.conformer_enc_kernel_size,
                conv_norm_type=self.conformer_conv_norm_type,
                attention_backend=self.attention_backend,
                sp_mesh=self.sp_mesh,
                sp_axis=self.sp_axis,
                pipe_mesh=self.pipe_mesh,
                pipe_microbatches=self.pipe_microbatches,
            )
        else:
            raise NotImplementedError(self.encoder_type)

        if self.spk_embed_dim is not None:
            self.projection = nn.Dense(self.adim)

        self.duration_predictor = DurationPredictor(
            n_layers=self.duration_predictor_layers,
            n_chans=self.duration_predictor_chans,
            kernel_size=self.duration_predictor_kernel_size,
            dropout_rate=self.duration_predictor_dropout_rate,
        )
        if not self.duration_predictor_use_encoder_outputs:
            self.duration_predictor_projection = Conv2dSubsampling(self.adim)

        if self.decoder_type == "transformer":
            self.decoder = Encoder(
                idim=0,
                attention_dim=self.adim,
                attention_heads=self.aheads,
                linear_units=self.dunits,
                num_blocks=self.dlayers,
                input_layer=None,
                pos_enc_type="scaled",
                normalize_before=self.decoder_normalize_before,
                concat_after=self.decoder_concat_after,
                positionwise_layer_type=self.positionwise_layer_type,
                positionwise_conv_kernel_size=self.positionwise_conv_kernel_size,
                dropout_rate=self.transformer_dec_dropout_rate,
                init_enc_alpha=self.init_dec_alpha,
            )
        elif self.decoder_type == "conformer":
            self.decoder = ConformerEncoder(
                idim=0,
                attention_dim=self.adim,
                attention_heads=self.aheads,
                linear_units=self.dunits,
                num_blocks=self.dlayers,
                input_layer=None,
                dropout_rate=self.transformer_dec_dropout_rate,
                positional_dropout_rate=self.transformer_dec_positional_dropout_rate,
                attention_dropout_rate=self.transformer_dec_attn_dropout_rate,
                normalize_before=self.decoder_normalize_before,
                concat_after=self.decoder_concat_after,
                positionwise_layer_type=self.positionwise_layer_type,
                positionwise_conv_kernel_size=self.positionwise_conv_kernel_size,
                macaron_style=self.use_macaron_style_in_conformer,
                pos_enc_layer_type=pos_enc,
                selfattention_layer_type=self_attn,
                use_cnn_module=self.use_cnn_in_conformer,
                cnn_module_kernel=self.conformer_dec_kernel_size,
                conv_norm_type=self.conformer_conv_norm_type,
                attention_backend=self.attention_backend,
                sp_mesh=self.sp_mesh,
                sp_axis=self.sp_axis,
                pipe_mesh=self.pipe_mesh,
                pipe_microbatches=self.pipe_microbatches,
            )
        else:
            raise NotImplementedError(self.decoder_type)

        r = self.decoder_reduction_factor
        self.feat_out = nn.Dense(self.odim * r)
        self.postnet = Postnet(
            odim=self.odim,
            n_layers=self.postnet_layers,
            n_chans=self.postnet_chans,
            n_filts=self.postnet_filts,
            dropout_rate=self.postnet_dropout_rate,
            use_norm=self.use_batch_norm,
            norm_type=self.postnet_norm_type,
        )

    def _conformer_types(self):
        pos_enc = self.conformer_pos_enc_layer_type
        self_attn = self.conformer_self_attn_layer_type
        if self.conformer_rel_pos_type == "legacy":
            if pos_enc == "rel_pos":
                pos_enc = "legacy_rel_pos"
            if self_attn == "rel_selfattn":
                self_attn = "legacy_rel_selfattn"
        return pos_enc, self_attn

    def _integrate_with_spk_embed(self, hs, spembs):
        spembs = spembs / jnp.maximum(
            jnp.linalg.norm(spembs, axis=-1, keepdims=True), 1e-12
        )
        if self.spk_embed_integration_type == "add":
            return hs + self.projection(spembs)[:, None, :]
        tiled = jnp.broadcast_to(spembs[:, None, :], hs.shape[:2] + (spembs.shape[-1],))
        return self.projection(jnp.concatenate([hs, tiled], axis=-1))

    def _encode(self, xs, ilens, spembs, deterministic):
        xs, ilens = reduce_frames(xs, ilens, self.encoder_reduction_factor)
        x_masks = make_non_pad_mask(ilens, xs.shape[1])
        hs, out_masks = self.encoder(xs, x_masks, deterministic=deterministic)
        if (
            self.encoder_type == "transformer"
            or self.encoder_input_layer == "conv2d"
        ):
            ilens = conv2d_subsampled_lengths(ilens)
        if self.spk_embed_dim is not None:
            hs = self._integrate_with_spk_embed(hs, spembs)
        return hs, ilens

    def _dp_features(self, hs, dp_inputs, deterministic):
        if self.duration_predictor_use_encoder_outputs:
            return hs
        dp, _ = self.duration_predictor_projection(dp_inputs, None)
        return nearest_interpolate(dp, hs.shape[1])

    @sp_safe_convs
    def __call__(
        self,
        src_speech,
        src_speech_lengths,
        tgt_speech,
        tgt_speech_lengths,
        durations,
        durations_lengths=None,
        dp_inputs=None,
        dp_lengths=None,
        spembs=None,
        max_feats: Optional[int] = None,
        deterministic: bool = False,
    ) -> Dict[str, Any]:
        """Training forward with teacher durations (B, T_text)."""
        xs, ys, ds = src_speech, tgt_speech, durations
        ilens, olens = src_speech_lengths, tgt_speech_lengths

        hs, ilens_red = self._encode(xs, ilens, spembs, deterministic)
        _dp_in = self._dp_features(hs, dp_inputs, deterministic)
        h_nonpad = make_non_pad_mask(ilens_red, hs.shape[1])

        d_outs = self.duration_predictor(_dp_in, ~h_nonpad, deterministic=deterministic)

        # align the (separately padded) teacher durations to the encoder grid
        T_h = hs.shape[1]
        if ds.shape[1] >= T_h:
            ds = ds[:, :T_h]
        else:
            ds = jnp.pad(ds, ((0, 0), (0, T_h - ds.shape[1])))
        ds = jnp.where(h_nonpad, ds, 0)

        scale = self.teacher_model_decoder_reduction_factor
        t_feats = max_feats if max_feats is not None else ys.shape[1]
        hs_up = length_regulator(hs, ds * scale, t_feats=t_feats)

        olens_red = (
            olens // self.decoder_reduction_factor
            if self.decoder_reduction_factor > 1
            else olens
        )
        d_masks = make_non_pad_mask(olens_red, hs_up.shape[1])
        zs, _ = self.decoder(hs_up, d_masks, deterministic=deterministic)
        B = zs.shape[0]
        before_outs = self.feat_out(zs).reshape(B, -1, self.odim)
        after_outs = before_outs + self.postnet(before_outs, deterministic=deterministic)

        olens_adj = olens - olens % self.decoder_reduction_factor
        return {
            "before_outs": before_outs,
            "after_outs": after_outs,
            "d_outs": d_outs,
            "ilens": ilens_red,
            "olens": olens_adj,
            "ys": ys,
        }

    def inference(
        self,
        src_speech,
        src_speech_lengths,
        dp_inputs=None,
        spembs=None,
        alpha: float = 1.0,
        max_output_frames: Optional[int] = None,
    ) -> Dict[str, Any]:
        xs, ilens = src_speech, src_speech_lengths
        hs, ilens_red = self._encode(xs, ilens, spembs, True)
        _dp_in = self._dp_features(hs, dp_inputs, True)
        h_nonpad = make_non_pad_mask(ilens_red, hs.shape[1])

        d_outs = self.duration_predictor(
            _dp_in, ~h_nonpad, is_inference=True, deterministic=True
        )
        scale = self.teacher_model_decoder_reduction_factor
        ds = jnp.round(d_outs * scale * alpha)
        ds = jnp.where(h_nonpad, ds, 0.0)

        if max_output_frames is None:
            max_output_frames = hs.shape[1] * scale * 4
        hs_up = length_regulator(hs, ds, t_feats=max_output_frames)
        out_lens = jnp.maximum(ds.sum(-1).astype(jnp.int32), 1)
        d_masks = make_non_pad_mask(out_lens, max_output_frames)
        zs, _ = self.decoder(hs_up, d_masks, deterministic=True)
        B = zs.shape[0]
        before_outs = self.feat_out(zs).reshape(B, -1, self.odim)
        # zero frames past each item's predicted length before the postnet
        # convs — the reference decodes at the exact regulated length, so
        # its postnet conv padding past the end is zeros (see
        # models/aas_vc.py inference for the same reference-parity masking)
        valid = jnp.arange(before_outs.shape[1])[None, :] < (
            out_lens * self.decoder_reduction_factor
        )[:, None]
        before_outs = jnp.where(valid[..., None], before_outs, 0.0)
        after_outs = before_outs + self.postnet(
            before_outs, deterministic=True, mask=valid
        )
        return {
            "outs": after_outs,
            "d_outs": d_outs,
            "d_lens": ilens_red,  # valid length of the duration grid
            "out_lens": out_lens * self.decoder_reduction_factor,
        }

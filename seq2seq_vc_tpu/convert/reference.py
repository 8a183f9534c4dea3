"""Name-based converters: reference torch state_dicts -> flax variables.

Converts checkpoints of the reference models (``seq2seq_vc/models/{vtn,
aas_vc,fastspeech_vc,transformer_tts}.py``) into this package's flax
parameter trees, so (a) numerical parity with the reference is provable
(``tests/test_reference_parity.py``) and (b) real pretrained reference
checkpoints load directly.

Every tensor is matched by its EXPLICIT torch parameter name — never by
shape — and conversion fails loudly listing any unconsumed torch tensors or
unfilled flax leaves. BatchNorm running statistics convert to the flax
``batch_stats`` collection; models must be configured with
``postnet_norm_type='batch_norm'`` / ``conformer_conv_norm_type='batch_norm'``
to accept them (the TPU-default GroupNorm has different semantics and
cannot represent a BN checkpoint).

Layout transforms (torch -> flax.linen):
- Linear ``weight (out, in)`` -> Dense ``kernel (in, out)`` (transpose).
- Conv1d ``weight (out, in/groups, k)`` -> Conv ``kernel (k, in/groups, out)``.
- Conv2d ``weight (out, in, kh, kw)`` -> Conv ``kernel (kh, kw, in, out)``.
- Conv2dSubsampling output Linear: torch flattens the conv output as
  (channel, freq) C-major, this package as (freq, channel) — the kernel
  rows are permuted accordingly (see ``_subsample_out_linear``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np


def _t2n(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    # COPY: ``Tensor.numpy()`` shares memory with the live torch parameter,
    # so without this a later in-place torch update (optimizer.step) would
    # silently mutate the converted flax tree (caught by the training-
    # trajectory parity test: the flax run started one Adam step ahead).
    return np.array(t)


class _StateDict:
    """Wrapper that tracks which torch tensors have been consumed."""

    def __init__(self, sd: Dict[str, Any]):
        self.sd = {
            k: _t2n(v)
            for k, v in sd.items()
            if not k.endswith("num_batches_tracked")
        }

    def pop(self, key: str) -> np.ndarray:
        try:
            return self.sd.pop(key)
        except KeyError:
            raise KeyError(
                f"torch parameter {key!r} not found in the checkpoint "
                f"(remaining keys: {sorted(self.sd)[:10]}...)"
            ) from None

    def has(self, key: str) -> bool:
        return key in self.sd

    def finish(self):
        if self.sd:
            raise ValueError(
                "unconverted torch tensors (name-matching incomplete): "
                f"{sorted(self.sd)}"
            )


# --------------------------------------------------------------- primitives
def _linear(sd: _StateDict, p: str, bias: bool = True) -> Dict[str, np.ndarray]:
    out = {"kernel": sd.pop(f"{p}.weight").T}
    if bias:
        out["bias"] = sd.pop(f"{p}.bias")
    return out


def _ln(sd: _StateDict, p: str) -> Dict[str, np.ndarray]:
    return {"scale": sd.pop(f"{p}.weight"), "bias": sd.pop(f"{p}.bias")}


def _embedding(sd: _StateDict, p: str) -> Dict[str, np.ndarray]:
    return {"embedding": sd.pop(f"{p}.weight")}


def _conv1d(sd: _StateDict, p: str, bias: bool = True) -> Dict[str, np.ndarray]:
    w = sd.pop(f"{p}.weight")  # (out, in/groups, k)
    out = {"kernel": w.transpose(2, 1, 0)}
    if bias:
        out["bias"] = sd.pop(f"{p}.bias")
    return out


def _conv2d(sd: _StateDict, p: str) -> Dict[str, np.ndarray]:
    w = sd.pop(f"{p}.weight")  # (out, in, kh, kw)
    return {"kernel": w.transpose(2, 3, 1, 0), "bias": sd.pop(f"{p}.bias")}


def _bn(sd: _StateDict, p: str):
    """BatchNorm -> (params, batch_stats)."""
    params = {"scale": sd.pop(f"{p}.weight"), "bias": sd.pop(f"{p}.bias")}
    stats = {"mean": sd.pop(f"{p}.running_mean"), "var": sd.pop(f"{p}.running_var")}
    return params, stats


def _subsample_out_linear(sd: _StateDict, p: str, odim: int) -> Dict[str, np.ndarray]:
    """Conv2dSubsampling's post-conv Linear with flatten-order permutation.

    torch input index = c * F' + f  (channel-major, ``subsampling.py:100``);
    flax input index  = f * C + c   (freq-major reshape in nn/transformer.py).
    """
    w = sd.pop(f"{p}.weight")  # (adim, C * F')
    C = odim
    F = w.shape[1] // C
    kernel = w.reshape(w.shape[0], C, F).transpose(2, 1, 0).reshape(F * C, w.shape[0])
    return {"kernel": kernel, "bias": sd.pop(f"{p}.bias")}


# --------------------------------------------------------------- components
def _attention(sd: _StateDict, p: str, rel_pos: bool = False) -> Dict[str, Any]:
    out = {
        "linear_q": _linear(sd, f"{p}.linear_q"),
        "linear_k": _linear(sd, f"{p}.linear_k"),
        "linear_v": _linear(sd, f"{p}.linear_v"),
        "linear_out": _linear(sd, f"{p}.linear_out"),
    }
    if rel_pos:
        out["linear_pos"] = _linear(sd, f"{p}.linear_pos", bias=False)
        out["pos_bias_u"] = sd.pop(f"{p}.pos_bias_u")
        out["pos_bias_v"] = sd.pop(f"{p}.pos_bias_v")
    return out


def _positionwise(sd: _StateDict, p: str, kind: str) -> Dict[str, Any]:
    if kind == "linear":
        return {
            "Dense_0": _linear(sd, f"{p}.w_1"),
            "Dense_1": _linear(sd, f"{p}.w_2"),
        }
    if kind == "conv1d":  # MultiLayeredConv1d: two Conv1d
        return {
            "Conv_0": _conv1d(sd, f"{p}.w_1"),
            "Conv_1": _conv1d(sd, f"{p}.w_2"),
        }
    if kind == "conv1d-linear":  # Conv1dLinear: Conv1d then Linear
        return {
            "Conv_0": _conv1d(sd, f"{p}.w_1"),
            "Dense_0": _linear(sd, f"{p}.w_2"),
        }
    raise ValueError(f"unknown positionwise_layer_type {kind!r}")


def _encoder_layer(sd: _StateDict, p: str, pw_kind: str, concat_after: bool) -> Dict[str, Any]:
    out = {
        "self_attn": _attention(sd, f"{p}.self_attn"),
        "feed_forward": _positionwise(sd, f"{p}.feed_forward", pw_kind),
        "norm1": _ln(sd, f"{p}.norm1"),
        "norm2": _ln(sd, f"{p}.norm2"),
    }
    if concat_after:
        out["concat_linear"] = _linear(sd, f"{p}.concat_linear")
    return out


def _decoder_layer(sd: _StateDict, p: str, concat_after: bool) -> Dict[str, Any]:
    out = {
        "self_attn": _attention(sd, f"{p}.self_attn"),
        "src_attn": _attention(sd, f"{p}.src_attn"),
        "feed_forward": {
            "Dense_0": _linear(sd, f"{p}.feed_forward.w_1"),
            "Dense_1": _linear(sd, f"{p}.feed_forward.w_2"),
        },
        "norm1": _ln(sd, f"{p}.norm1"),
        "norm2": _ln(sd, f"{p}.norm2"),
        "norm3": _ln(sd, f"{p}.norm3"),
    }
    if concat_after:
        out["concat_linear1"] = _linear(sd, f"{p}.concat_linear1")
        out["concat_linear2"] = _linear(sd, f"{p}.concat_linear2")
    return out


def _conformer_layer(
    sd: _StateDict,
    p: str,
    pw_kind: str,
    macaron: bool,
    use_cnn: bool,
    concat_after: bool,
    norm_type: str,
):
    """Returns (params, batch_stats or None)."""
    params: Dict[str, Any] = {
        "self_attn": _attention(sd, f"{p}.self_attn", rel_pos=True),
        "feed_forward": _positionwise(sd, f"{p}.feed_forward", pw_kind),
        "norm_ff": _ln(sd, f"{p}.norm_ff"),
        "norm_mha": _ln(sd, f"{p}.norm_mha"),
    }
    stats = None
    if macaron:
        params["feed_forward_macaron"] = _positionwise(
            sd, f"{p}.feed_forward_macaron", pw_kind
        )
        params["norm_ff_macaron"] = _ln(sd, f"{p}.norm_ff_macaron")
    if use_cnn:
        conv = {
            "Conv_0": _conv1d(sd, f"{p}.conv_module.pointwise_conv1"),
            "Conv_1": _conv1d(sd, f"{p}.conv_module.depthwise_conv"),
            "Conv_2": _conv1d(sd, f"{p}.conv_module.pointwise_conv2"),
        }
        if sd.has(f"{p}.conv_module.norm.running_mean"):
            if norm_type != "batch_norm":
                raise ValueError(
                    "checkpoint contains conformer BatchNorm running stats; "
                    "set conformer_conv_norm_type='batch_norm' on the model "
                    "(the TPU-default GroupNorm cannot represent them)"
                )
            bn_p, bn_s = _bn(sd, f"{p}.conv_module.norm")
            conv["BatchNorm_0"] = bn_p
            stats = {"conv_module": {"BatchNorm_0": bn_s}}
        else:
            conv["MaskedGroupNorm_0"] = _ln(sd, f"{p}.conv_module.norm")
        params["conv_module"] = conv
        params["norm_conv"] = _ln(sd, f"{p}.norm_conv")
        params["norm_final"] = _ln(sd, f"{p}.norm_final")
    if concat_after:
        params["concat_linear"] = _linear(sd, f"{p}.concat_linear")
    return params, stats


def _transformer_encoder(
    sd: _StateDict,
    p: str,
    *,
    input_layer: str,
    num_blocks: int,
    normalize_before: bool,
    concat_after: bool,
    pw_kind: str,
    adim: int,
) -> Dict[str, Any]:
    params: Dict[str, Any] = {}
    if input_layer in ("conv2d", "conv2d-scaled-pos-enc"):
        params["subsample"] = {
            "Conv_0": _conv2d(sd, f"{p}.embed.conv.0"),
            "Conv_1": _conv2d(sd, f"{p}.embed.conv.2"),
            "Dense_0": _subsample_out_linear(sd, f"{p}.embed.out.0", adim),
        }
        if sd.has(f"{p}.embed.out.1.alpha"):
            params["pos_enc"] = {"alpha": sd.pop(f"{p}.embed.out.1.alpha")}
    elif input_layer == "linear":
        params["pre"] = _linear(sd, f"{p}.embed.0")
        params["pre_norm"] = _ln(sd, f"{p}.embed.1")
        if sd.has(f"{p}.embed.4.alpha"):  # Linear,LN,Dropout,ReLU,PE
            params["pos_enc"] = {"alpha": sd.pop(f"{p}.embed.4.alpha")}
        elif sd.has(f"{p}.embed.3.alpha"):  # conformer: Linear,LN,Dropout,PE
            params["pos_enc"] = {"alpha": sd.pop(f"{p}.embed.3.alpha")}
    elif input_layer == "embed":
        params["embed_tokens"] = _embedding(sd, f"{p}.embed.0")
        if sd.has(f"{p}.embed.1.alpha"):
            params["pos_enc"] = {"alpha": sd.pop(f"{p}.embed.1.alpha")}
    elif input_layer is None:
        if sd.has(f"{p}.embed.0.alpha"):
            params["pos_enc"] = {"alpha": sd.pop(f"{p}.embed.0.alpha")}
    else:
        raise ValueError(f"unknown input_layer {input_layer!r}")

    for i in range(num_blocks):
        params[f"layers_{i}"] = _encoder_layer(
            sd, f"{p}.encoders.{i}", pw_kind, concat_after
        )
    if normalize_before:
        params["after_norm"] = _ln(sd, f"{p}.after_norm")
    return params


def _conformer_encoder(
    sd: _StateDict,
    p: str,
    *,
    input_layer: Optional[str],
    num_blocks: int,
    normalize_before: bool,
    concat_after: bool,
    pw_kind: str,
    macaron: bool,
    use_cnn: bool,
    conv_norm_type: str,
    adim: int,
):
    """Returns (params, batch_stats or None)."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    if input_layer == "linear":
        params["pre"] = _linear(sd, f"{p}.embed.0")
        params["pre_norm"] = _ln(sd, f"{p}.embed.1")
        if sd.has(f"{p}.embed.3.alpha"):
            params["pos_enc"] = {"alpha": sd.pop(f"{p}.embed.3.alpha")}
    elif input_layer == "conv2d":
        params["subsample"] = {
            "Conv_0": _conv2d(sd, f"{p}.embed.conv.0"),
            "Conv_1": _conv2d(sd, f"{p}.embed.conv.2"),
            "Dense_0": _subsample_out_linear(sd, f"{p}.embed.out.0", adim),
        }
        if sd.has(f"{p}.embed.out.1.alpha"):
            params["pos_enc"] = {"alpha": sd.pop(f"{p}.embed.out.1.alpha")}
    elif input_layer == "embed":
        params["embed_tokens"] = _embedding(sd, f"{p}.embed.0")
        if sd.has(f"{p}.embed.1.alpha"):
            params["pos_enc"] = {"alpha": sd.pop(f"{p}.embed.1.alpha")}
    elif input_layer is None:
        if sd.has(f"{p}.embed.0.alpha"):
            params["pos_enc"] = {"alpha": sd.pop(f"{p}.embed.0.alpha")}
    else:
        raise ValueError(f"unknown input_layer {input_layer!r}")

    for i in range(num_blocks):
        lp, ls = _conformer_layer(
            sd, f"{p}.encoders.{i}", pw_kind, macaron, use_cnn, concat_after,
            conv_norm_type,
        )
        params[f"layers_{i}"] = lp
        if ls is not None:
            stats[f"layers_{i}"] = ls
    if normalize_before:
        params["after_norm"] = _ln(sd, f"{p}.after_norm")
    return params, (stats or None)


def _postnet(sd: _StateDict, p: str, n_layers: int, use_norm: bool, norm_type: str):
    """Returns (params, batch_stats or None)."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for i in range(n_layers):
        params[f"Conv_{i}"] = _conv1d(sd, f"{p}.{i}.0", bias=False)
        if use_norm:
            if sd.has(f"{p}.{i}.1.running_mean"):
                if norm_type != "batch_norm":
                    raise ValueError(
                        "checkpoint contains postnet BatchNorm running stats; "
                        "set postnet_norm_type='batch_norm' on the model"
                    )
                bn_p, bn_s = _bn(sd, f"{p}.{i}.1")
                params[f"BatchNorm_{i}"] = bn_p
                stats[f"BatchNorm_{i}"] = bn_s
            else:
                params[f"GroupNorm_{i}"] = _ln(sd, f"{p}.{i}.1")
    return params, (stats or None)


def _duration_predictor(sd: _StateDict, p: str, n_layers: int) -> Dict[str, Any]:
    params: Dict[str, Any] = {}
    for i in range(n_layers):
        params[f"Conv_{i}"] = _conv1d(sd, f"{p}.conv.{i}.0")
        params[f"LayerNorm_{i}"] = _ln(sd, f"{p}.conv.{i}.2")
    params["Dense_0"] = _linear(sd, f"{p}.linear")
    return params


def _alignment_module(sd: _StateDict, p: str) -> Dict[str, Any]:
    return {
        name: _conv1d(sd, f"{p}.{name}")
        for name in ("t_conv1", "t_conv2", "f_conv1", "f_conv2", "f_conv3")
    }


def _prenet(sd: _StateDict, p: str, n_layers: int) -> Dict[str, Any]:
    return {
        f"Dense_{i}": _linear(sd, f"{p}.prenet.{i}.0") for i in range(n_layers)
    }


def _conv1x1_as_dense(sd: _StateDict, p: str) -> Dict[str, np.ndarray]:
    """torch Conv1d kernel-1 -> flax Dense (the SDP's pre/proj layers)."""
    w = sd.pop(f"{p}.weight")  # (out, in, 1)
    return {"kernel": w[:, :, 0].T, "bias": sd.pop(f"{p}.bias")}


def _dds_conv(sd: _StateDict, p: str, n_layers: int) -> Dict[str, Any]:
    """DilatedDepthSeparableConv (vits/flow.py:130-193): per layer the torch
    Sequential holds depthwise conv (.0), LN (.2), 1x1 conv (.5), LN (.7)."""
    out: Dict[str, Any] = {}
    for i in range(n_layers):
        out[f"Conv_{2 * i}"] = _conv1d(sd, f"{p}.convs.{i}.0")
        out[f"LayerNorm_{2 * i}"] = _ln(sd, f"{p}.convs.{i}.2")
        out[f"Conv_{2 * i + 1}"] = _conv1d(sd, f"{p}.convs.{i}.5")
        out[f"LayerNorm_{2 * i + 1}"] = _ln(sd, f"{p}.convs.{i}.7")
    return out


def _flow_list(sd: _StateDict, p: str, n_flows: int, dds_layers: int) -> Dict[str, Any]:
    """[ElementwiseAffine(0), ConvFlow(1), Flip(2), ConvFlow(3), ...] —
    flips are parameterless, so torch index 2j-1 is flax list entry j."""
    out: Dict[str, Any] = {
        "0": {
            "m": sd.pop(f"{p}.0.m")[:, 0],
            "logs": sd.pop(f"{p}.0.logs")[:, 0],
        }
    }
    for j in range(1, n_flows + 1):
        t = 2 * j - 1
        out[str(j)] = {
            "input_conv": _conv1d(sd, f"{p}.{t}.input_conv"),
            "dds_conv": _dds_conv(sd, f"{p}.{t}.dds_conv", dds_layers),
            "proj": _conv1d(sd, f"{p}.{t}.proj"),
        }
    return out


def _sdp(sd: _StateDict, p: str, n_flows: int, dds_layers: int) -> Dict[str, Any]:
    """StochasticDurationPredictor (duration_predictor.py:131-304)."""
    out: Dict[str, Any] = {
        "pre": _conv1x1_as_dense(sd, f"{p}.pre"),
        "dds": _dds_conv(sd, f"{p}.dds", dds_layers),
        "proj": _conv1x1_as_dense(sd, f"{p}.proj"),
        "post_pre": _conv1x1_as_dense(sd, f"{p}.post_pre"),
        "post_dds": _dds_conv(sd, f"{p}.post_dds", dds_layers),
        "post_proj": _conv1x1_as_dense(sd, f"{p}.post_proj"),
    }
    main = _flow_list(sd, f"{p}.flows", n_flows, dds_layers)
    post = _flow_list(sd, f"{p}.post_flows", n_flows, dds_layers)
    for j, tree in main.items():
        out[f"main_flows_{j}"] = tree
    for j, tree in post.items():
        out[f"post_flows_{j}"] = tree
    return out


def _assemble(params: Dict[str, Any], stats: Dict[str, Any]) -> Dict[str, Any]:
    params = {k: v for k, v in params.items() if v is not None}
    out: Dict[str, Any] = {"params": params}
    stats = {k: v for k, v in stats.items() if v}
    if stats:
        out["batch_stats"] = stats
    return out


# ------------------------------------------------------------------- models
def convert_vtn(state_dict: Dict[str, Any], model) -> Dict[str, Any]:
    """Reference ``models/vtn.py:14`` state_dict -> flax variables for
    :class:`seq2seq_vc_tpu.models.VTN` (config fields must match the
    checkpoint's model_params)."""
    sd = _StateDict(state_dict)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    if model.encoder_type == "transformer":
        params["encoder"] = _transformer_encoder(
            sd, "encoder",
            input_layer=model.encoder_input_layer,
            num_blocks=model.elayers,
            normalize_before=model.encoder_normalize_before,
            concat_after=model.encoder_concat_after,
            pw_kind=model.positionwise_layer_type,
            adim=model.adim,
        )
    else:
        enc_p, enc_s = _conformer_encoder(
            sd, "encoder",
            input_layer="conv2d",
            num_blocks=model.elayers,
            normalize_before=model.encoder_normalize_before,
            concat_after=model.encoder_concat_after,
            pw_kind=model.positionwise_layer_type,
            macaron=model.use_macaron_style_in_conformer,
            use_cnn=model.use_cnn_in_conformer,
            conv_norm_type=model.conformer_conv_norm_type,
            adim=model.adim,
        )
        params["encoder"] = enc_p
        if enc_s:
            stats["encoder"] = enc_s

    if model.spk_embed_dim is not None:
        params["projection"] = _linear(sd, "projection")

    params["dprenet"] = _prenet(sd, "decoder.embed.0.0", model.dprenet_layers)
    params["dprenet_proj"] = _linear(sd, "decoder.embed.0.1")
    dec = {
        "pos_enc": {"alpha": sd.pop("decoder.embed.1.alpha")},
    }
    for i in range(model.dlayers):
        dec[f"layers_{i}"] = _decoder_layer(
            sd, f"decoder.decoders.{i}", model.decoder_concat_after
        )
    if model.decoder_normalize_before:
        dec["after_norm"] = _ln(sd, "decoder.after_norm")
    params["decoder"] = dec

    params["feat_out"] = _linear(sd, "feat_out")
    params["prob_out"] = _linear(sd, "prob_out")
    if model.postnet_layers > 0:
        pn_p, pn_s = _postnet(
            sd, "postnet.postnet", model.postnet_layers,
            model.use_batch_norm, model.postnet_norm_type,
        )
        params["postnet"] = pn_p
        if pn_s:
            stats["postnet"] = pn_s

    sd.finish()
    return _assemble(params, stats)


def convert_transformer_tts(state_dict: Dict[str, Any], model) -> Dict[str, Any]:
    """Reference ``models/transformer_tts.py:13`` -> flax TransformerTTS."""
    sd = _StateDict(state_dict)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    params["encoder"] = _transformer_encoder(
        sd, "encoder",
        input_layer="embed",
        num_blocks=model.elayers,
        normalize_before=model.encoder_normalize_before,
        concat_after=model.encoder_concat_after,
        pw_kind=model.positionwise_layer_type,
        adim=model.adim,
    )
    if model.spk_embed_dim is not None:
        params["projection"] = _linear(sd, "projection")
    params["dprenet"] = _prenet(sd, "decoder.embed.0.0", model.dprenet_layers)
    params["dprenet_proj"] = _linear(sd, "decoder.embed.0.1")
    dec = {"pos_enc": {"alpha": sd.pop("decoder.embed.1.alpha")}}
    for i in range(model.dlayers):
        dec[f"layers_{i}"] = _decoder_layer(
            sd, f"decoder.decoders.{i}", model.decoder_concat_after
        )
    if model.decoder_normalize_before:
        dec["after_norm"] = _ln(sd, "decoder.after_norm")
    params["decoder"] = dec
    params["feat_out"] = _linear(sd, "feat_out")
    params["prob_out"] = _linear(sd, "prob_out")
    if model.postnet_layers > 0:
        pn_p, pn_s = _postnet(
            sd, "postnet.postnet", model.postnet_layers,
            model.use_batch_norm, model.postnet_norm_type,
        )
        params["postnet"] = pn_p
        if pn_s:
            stats["postnet"] = pn_s
    sd.finish()
    return _assemble(params, stats)


def convert_aasvc(state_dict: Dict[str, Any], model) -> Dict[str, Any]:
    """Reference ``models/aas_vc.py:38`` -> flax AASVC.

    The stochastic duration predictor (VITS flows) is not yet mapped —
    convert deterministic-DP checkpoints, or extend ``_sdp`` here.
    """
    sd = _StateDict(state_dict)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    enc_p, enc_s = _conformer_encoder(
        sd, "encoder",
        input_layer=model.encoder_input_layer,
        num_blocks=model.elayers,
        normalize_before=model.encoder_normalize_before,
        concat_after=model.encoder_concat_after,
        pw_kind=model.positionwise_layer_type,
        macaron=model.use_macaron_style_in_conformer,
        use_cnn=model.use_cnn_in_conformer,
        conv_norm_type=model.conformer_conv_norm_type,
        adim=model.adim,
    )
    params["encoder"] = enc_p
    if enc_s:
        stats["encoder"] = enc_s

    if model.spk_embed_dim is not None:
        params["projection"] = _linear(sd, "projection")

    if model.duration_predictor_type == "deterministic":
        params["duration_predictor"] = _duration_predictor(
            sd, "duration_predictor", model.duration_predictor_layers
        )
    else:
        params["duration_predictor"] = _sdp(
            sd, "duration_predictor",
            model.stochastic_duration_predictor_flows,
            model.stochastic_duration_predictor_dds_conv_layers,
        )
    if not model.duration_predictor_use_encoder_outputs:
        # the reference builds this Conv2dSubsampling with use_pos_enc=False
        # (aas_vc.py:194-196), so `out` is a BARE Linear ("...out.weight");
        # encoder input layers use the Sequential form ("...out.0.weight")
        dp_out = (
            "duration_predictor_projection.out.0"
            if sd.has("duration_predictor_projection.out.0.weight")
            else "duration_predictor_projection.out"
        )
        params["duration_predictor_projection"] = {
            "Conv_0": _conv2d(sd, "duration_predictor_projection.conv.0"),
            "Conv_1": _conv2d(sd, "duration_predictor_projection.conv.2"),
            "Dense_0": _subsample_out_linear(sd, dp_out, model.adim),
        }

    params["alignment_module"] = _alignment_module(sd, "alignment_module")

    dec_p, dec_s = _conformer_encoder(
        sd, "decoder",
        input_layer=None,
        num_blocks=model.dlayers,
        normalize_before=model.decoder_normalize_before,
        concat_after=model.decoder_concat_after,
        pw_kind=model.positionwise_layer_type,
        macaron=model.use_macaron_style_in_conformer,
        use_cnn=model.use_cnn_in_conformer,
        conv_norm_type=model.conformer_conv_norm_type,
        adim=model.adim * model.post_encoder_reduction_factor,
    )
    params["decoder"] = dec_p
    if dec_s:
        stats["decoder"] = dec_s

    params["feat_out"] = _linear(sd, "feat_out")
    if model.postnet_layers > 0:
        pn_p, pn_s = _postnet(
            sd, "postnet.postnet", model.postnet_layers,
            model.use_batch_norm, model.postnet_norm_type,
        )
        params["postnet"] = pn_p
        if pn_s:
            stats["postnet"] = pn_s

    sd.finish()
    return _assemble(params, stats)


def convert_fastspeech_vc(state_dict: Dict[str, Any], model) -> Dict[str, Any]:
    """Reference ``models/fastspeech_vc.py:21`` -> flax FastSpeechVC."""
    sd = _StateDict(state_dict)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    if model.encoder_type == "transformer":
        params["encoder"] = _transformer_encoder(
            sd, "encoder",
            input_layer="conv2d-scaled-pos-enc",
            num_blocks=model.elayers,
            normalize_before=model.encoder_normalize_before,
            concat_after=model.encoder_concat_after,
            pw_kind=model.positionwise_layer_type,
            adim=model.adim,
        )
    else:
        enc_p, enc_s = _conformer_encoder(
            sd, "encoder",
            input_layer=model.encoder_input_layer,
            num_blocks=model.elayers,
            normalize_before=model.encoder_normalize_before,
            concat_after=model.encoder_concat_after,
            pw_kind=model.positionwise_layer_type,
            macaron=model.use_macaron_style_in_conformer,
            use_cnn=model.use_cnn_in_conformer,
            conv_norm_type=model.conformer_conv_norm_type,
            adim=model.adim,
        )
        params["encoder"] = enc_p
        if enc_s:
            stats["encoder"] = enc_s

    if model.spk_embed_dim is not None:
        params["projection"] = _linear(sd, "projection")

    params["duration_predictor"] = _duration_predictor(
        sd, "duration_predictor", model.duration_predictor_layers
    )
    if not model.duration_predictor_use_encoder_outputs:
        # the reference builds this Conv2dSubsampling with use_pos_enc=False
        # (aas_vc.py:194-196), so `out` is a BARE Linear ("...out.weight");
        # encoder input layers use the Sequential form ("...out.0.weight")
        dp_out = (
            "duration_predictor_projection.out.0"
            if sd.has("duration_predictor_projection.out.0.weight")
            else "duration_predictor_projection.out"
        )
        params["duration_predictor_projection"] = {
            "Conv_0": _conv2d(sd, "duration_predictor_projection.conv.0"),
            "Conv_1": _conv2d(sd, "duration_predictor_projection.conv.2"),
            "Dense_0": _subsample_out_linear(sd, dp_out, model.adim),
        }

    if model.decoder_type == "transformer":
        params["decoder"] = _transformer_encoder(
            sd, "decoder",
            input_layer=None,
            num_blocks=model.dlayers,
            normalize_before=model.decoder_normalize_before,
            concat_after=model.decoder_concat_after,
            pw_kind=model.positionwise_layer_type,
            adim=model.adim,
        )
    else:
        dec_p, dec_s = _conformer_encoder(
            sd, "decoder",
            input_layer=None,
            num_blocks=model.dlayers,
            normalize_before=model.decoder_normalize_before,
            concat_after=model.decoder_concat_after,
            pw_kind=model.positionwise_layer_type,
            macaron=model.use_macaron_style_in_conformer,
            use_cnn=model.use_cnn_in_conformer,
            conv_norm_type=model.conformer_conv_norm_type,
            adim=model.adim,
        )
        params["decoder"] = dec_p
        if dec_s:
            stats["decoder"] = dec_s

    params["feat_out"] = _linear(sd, "feat_out")
    pn_p, pn_s = _postnet(
        sd, "postnet.postnet", model.postnet_layers,
        model.use_batch_norm, model.postnet_norm_type,
    )
    params["postnet"] = pn_p
    if pn_s:
        stats["postnet"] = pn_s

    sd.finish()
    return _assemble(params, stats)

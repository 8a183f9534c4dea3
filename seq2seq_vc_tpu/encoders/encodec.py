"""Native EnCodec-24kHz encoder (flax) + torch checkpoint converter.

The reference extracts *continuous* 128-d embeddings from the EnCodec
encoder (``/root/reference/seq2seq_vc/utils/encodec.py:36-49`` — it calls
``model.encoder(x)`` only; the quantizer is never used) inside
``bin/preprocess.py:285-296``. This module is a TPU-native port of that
encoder: the SEANet stack (causal convs + residual blocks + 2-layer LSTM)
as a jittable flax module, with a converter that accepts either

- a HuggingFace ``transformers.EncodecModel`` state_dict
  (``encoder.layers.N.conv.parametrizations.weight.original{0,1}`` naming) —
  this is also what the numerical parity test instantiates in-image, or
- the original facebookresearch/encodec package checkpoint
  (``encoder.model.N.conv.conv.weight_{g,v}`` naming).

Weight norm is folded into plain conv weights at conversion time.

Architecture (24 kHz model): Conv(1->32, k7) -> 4x [ResnetBlock ->
ELU -> DownConv(k=2r, s=r)] with ratios (2, 4, 5, 8) and channel doubling
-> LSTM(512) x2 (residual) -> ELU -> Conv(512->128, k7). All convs causal
(left reflect padding), ELU activations. Output frame rate: 75 Hz.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 24000
EMBED_DIM = 128
NUM_FILTERS = 32
RATIOS = (8, 5, 4, 2)  # hop = prod = 320 -> 75 Hz
HOP = 320  # samples per latent frame (T_latents = ceil(n / HOP))
KERNEL = 7
LAST_KERNEL = 7
RESID_KERNEL = 3
COMPRESS = 2
LSTM_LAYERS = 2


def _causal_pad(x: jnp.ndarray, kernel: int, stride: int, dilation: int = 1):
    """HF EncodecConv1d padding: left ``padding_total`` + right extra so the
    final window is full (reflect mode). x: (B, T, C); shapes static."""
    keff = (kernel - 1) * dilation + 1
    pad_total = keff - stride
    length = x.shape[1]
    n_frames = (length - keff + pad_total) / stride + 1
    ideal = (math.ceil(n_frames) - 1) * stride + keff - pad_total
    extra = ideal - length
    return jnp.pad(x, ((0, 0), (pad_total, extra), (0, 0)), mode="reflect")


class _CausalConv(nn.Module):
    features: int
    kernel: int
    stride: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        x = _causal_pad(x, self.kernel, self.stride, self.dilation)
        return nn.Conv(
            self.features, (self.kernel,), strides=(self.stride,),
            kernel_dilation=(self.dilation,), padding="VALID",
        )(x)


class _ResnetBlock(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        h = nn.elu(x)
        h = _CausalConv(self.dim // COMPRESS, RESID_KERNEL, name="conv1")(h)
        h = nn.elu(h)
        h = _CausalConv(self.dim, 1, name="conv2")(h)
        shortcut = _CausalConv(self.dim, 1, name="shortcut")(x)
        return shortcut + h


class _LSTM(nn.Module):
    """2-layer residual LSTM matching torch gate order (i, f, g, o)."""

    hidden: int
    layers: int = LSTM_LAYERS

    @nn.compact
    def __call__(self, x):  # (B, T, C)
        resid = x
        h0 = jnp.zeros((x.shape[0], self.hidden), x.dtype)
        for layer in range(self.layers):
            wih = self.param(
                f"wih_l{layer}", nn.initializers.xavier_uniform(),
                (4 * self.hidden, x.shape[-1]),
            )
            whh = self.param(
                f"whh_l{layer}", nn.initializers.xavier_uniform(),
                (4 * self.hidden, self.hidden),
            )
            bih = self.param(f"bih_l{layer}", nn.initializers.zeros, (4 * self.hidden,))
            bhh = self.param(f"bhh_l{layer}", nn.initializers.zeros, (4 * self.hidden,))

            def step(carry, xt, wih=wih, whh=whh, bih=bih, bhh=bhh):
                h, c = carry
                gates = xt @ wih.T + bih + h @ whh.T + bhh
                i, f, g, o = jnp.split(gates, 4, axis=-1)
                c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
                h = jax.nn.sigmoid(o) * jnp.tanh(c)
                return (h, c), h

            _, ys = jax.lax.scan(step, (h0, h0), x.transpose(1, 0, 2))
            x = ys.transpose(1, 0, 2)
        return x + resid


class _CausalConvTranspose(nn.Module):
    """torch ConvTranspose1d + causal trim (HF EncodecConvTranspose1d:
    full transposed conv, then drop ``kernel - stride`` frames from the
    right — trim_right_ratio = 1.0)."""

    features: int
    kernel: int
    stride: int

    @nn.compact
    def __call__(self, x):  # (B, T, C)
        in_ch = x.shape[-1]
        w = self.param(
            "kernel", nn.initializers.lecun_normal(), (self.kernel, in_ch, self.features)
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        # torch ConvTranspose == lhs-dilated conv with the kernel flipped
        y = jax.lax.conv_general_dilated(
            x, w[::-1],
            window_strides=(1,),
            padding=[(self.kernel - 1, self.kernel - 1)],
            lhs_dilation=(self.stride,),
            dimension_numbers=("NTC", "TIO", "NTC"),
        ) + b
        trim = self.kernel - self.stride
        return y[:, : y.shape[1] - trim] if trim > 0 else y


class EncodecDecoder(nn.Module):
    """SEANet decoder: (B, T, 128) embeddings -> (B, T*320) 24 kHz wav.

    The reference imports ``seq2seq_vc.vocoder.encodec.EnCodec_decoder``
    (``bin/vc_train.py:40``) from a module that does not exist in the
    snapshot — this native port makes the encodec vocoder path actually
    work. Mirror of the encoder: Conv(128->512, k7) -> LSTM x2 ->
    4x [ELU -> ConvTranspose(k=2r, s=r) -> ResnetBlock] with ratios
    (8, 5, 4, 2) and channel halving -> ELU -> Conv(32->1, k7).
    """

    @nn.compact
    def __call__(self, emb: jnp.ndarray) -> jnp.ndarray:
        dim = NUM_FILTERS * 2 ** len(RATIOS)  # 512
        x = _CausalConv(dim, KERNEL, name="conv_in")(emb)
        x = _LSTM(dim, name="lstm")(x)
        for i, ratio in enumerate(RATIOS):
            x = nn.elu(x)
            x = _CausalConvTranspose(dim // 2, 2 * ratio, ratio, name=f"up{i}")(x)
            dim //= 2
            x = _ResnetBlock(dim, name=f"res{i}")(x)
        x = nn.elu(x)
        x = _CausalConv(1, LAST_KERNEL, name="conv_out")(x)
        return x[..., 0]  # (B, n_samples)


class EncodecEncoder(nn.Module):
    """SEANet encoder; input (B, n_samples) 24 kHz mono in [-1, 1]."""

    @nn.compact
    def __call__(self, wav: jnp.ndarray) -> jnp.ndarray:
        x = wav[..., None]  # (B, T, 1)
        x = _CausalConv(NUM_FILTERS, KERNEL, name="conv_in")(x)
        dim = NUM_FILTERS
        for i, ratio in enumerate(reversed(RATIOS)):
            x = _ResnetBlock(dim, name=f"res{i}")(x)
            x = nn.elu(x)
            x = _CausalConv(dim * 2, 2 * ratio, stride=ratio, name=f"down{i}")(x)
            dim *= 2
        x = _LSTM(dim, name="lstm")(x)
        x = nn.elu(x)
        x = _CausalConv(EMBED_DIM, LAST_KERNEL, name="conv_out")(x)
        return x  # (B, T/320, 128)


# --------------------------------------------------------------- conversion
def _fold_weight_norm(g: np.ndarray, v: np.ndarray) -> np.ndarray:
    """weight = g * v / ||v||_(in,k) per output channel (torch conv layout)."""
    norm = np.sqrt((v ** 2).sum(axis=(1, 2), keepdims=True))
    return g * v / np.maximum(norm, 1e-12)


def _torch_conv(sd: Dict[str, np.ndarray], prefix: str) -> Tuple[np.ndarray, np.ndarray]:
    """Read a (possibly weight-normed) torch conv; return flax kernel+bias."""
    if f"{prefix}.parametrizations.weight.original0" in sd:  # HF >= 4.27
        g = sd[f"{prefix}.parametrizations.weight.original0"]
        v = sd[f"{prefix}.parametrizations.weight.original1"]
        w = _fold_weight_norm(g, v)
    elif f"{prefix}.weight_g" in sd:  # facebookresearch/encodec
        w = _fold_weight_norm(sd[f"{prefix}.weight_g"], sd[f"{prefix}.weight_v"])
    else:
        w = sd[f"{prefix}.weight"]
    b = sd[f"{prefix}.bias"]
    # torch (out, in, k) -> flax (k, in, out)
    return np.ascontiguousarray(np.transpose(w, (2, 1, 0))), b


def convert_torch_encodec(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Torch EnCodec state_dict -> flax params for ``EncodecEncoder``.

    Accepts HF ``transformers.EncodecModel`` naming
    (``encoder.layers.N...``) or the original encodec package naming
    (``encoder.model.N.conv.conv...``); tensors may be torch or numpy.
    """
    sd = {}
    for k, v in state_dict.items():
        arr = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        k = k.replace("encoder.model.", "encoder.layers.")
        k = k.replace(".conv.conv.", ".conv.")
        sd[k.replace("encoder.layers.", "")] = arr.astype(np.float32)

    def conv(prefix):
        k, b = _torch_conv(sd, prefix)
        return {"Conv_0": {"kernel": jnp.asarray(k), "bias": jnp.asarray(b)}}

    params: Dict[str, Any] = {"conv_in": conv("0.conv")}
    # layers: 0 conv, then per ratio i: 3i+1 res, 3i+2 elu, 3i+3 down
    for i in range(4):
        base = 3 * i + 1
        params[f"res{i}"] = {
            "conv1": conv(f"{base}.block.1.conv"),
            "conv2": conv(f"{base}.block.3.conv"),
            "shortcut": conv(f"{base}.shortcut.conv"),
        }
        params[f"down{i}"] = conv(f"{base + 2}.conv")
    lstm = {}
    for layer in range(LSTM_LAYERS):
        lstm[f"wih_l{layer}"] = jnp.asarray(sd[f"13.lstm.weight_ih_l{layer}"])
        lstm[f"whh_l{layer}"] = jnp.asarray(sd[f"13.lstm.weight_hh_l{layer}"])
        lstm[f"bih_l{layer}"] = jnp.asarray(sd[f"13.lstm.bias_ih_l{layer}"])
        lstm[f"bhh_l{layer}"] = jnp.asarray(sd[f"13.lstm.bias_hh_l{layer}"])
    params["lstm"] = lstm
    params["conv_out"] = conv("15.conv")
    return {"params": params}


def convert_torch_encodec_decoder(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Torch EnCodec decoder weights -> flax params for ``EncodecDecoder``.

    Accepts HF (``decoder.layers.N...``) or facebookresearch
    (``decoder.model.N.conv.conv...``) naming.
    """
    sd = {}
    for k, v in state_dict.items():
        arr = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        k = k.replace("decoder.model.", "decoder.layers.")
        k = k.replace(".conv.conv.", ".conv.").replace(".convtr.convtr.", ".conv.")
        sd[k.replace("decoder.layers.", "")] = arr.astype(np.float32)

    def conv(prefix):
        k, b = _torch_conv(sd, prefix)
        return {"Conv_0": {"kernel": jnp.asarray(k), "bias": jnp.asarray(b)}}

    def convtr(prefix):
        if f"{prefix}.parametrizations.weight.original0" in sd:
            g = sd[f"{prefix}.parametrizations.weight.original0"]
            v = sd[f"{prefix}.parametrizations.weight.original1"]
            w = _fold_weight_norm(g, v)
        elif f"{prefix}.weight_g" in sd:
            w = _fold_weight_norm(sd[f"{prefix}.weight_g"], sd[f"{prefix}.weight_v"])
        else:
            w = sd[f"{prefix}.weight"]
        # torch ConvTranspose1d (in, out, k) -> (k, in, out)
        return {
            "kernel": jnp.asarray(np.ascontiguousarray(np.transpose(w, (2, 0, 1)))),
            "bias": jnp.asarray(sd[f"{prefix}.bias"]),
        }

    params: Dict[str, Any] = {"conv_in": conv("0.conv")}
    lstm = {}
    for layer in range(LSTM_LAYERS):
        lstm[f"wih_l{layer}"] = jnp.asarray(sd[f"1.lstm.weight_ih_l{layer}"])
        lstm[f"whh_l{layer}"] = jnp.asarray(sd[f"1.lstm.weight_hh_l{layer}"])
        lstm[f"bih_l{layer}"] = jnp.asarray(sd[f"1.lstm.bias_ih_l{layer}"])
        lstm[f"bhh_l{layer}"] = jnp.asarray(sd[f"1.lstm.bias_hh_l{layer}"])
    params["lstm"] = lstm
    for i in range(4):
        params[f"up{i}"] = convtr(f"{3 * i + 3}.conv")
        params[f"res{i}"] = {
            "conv1": conv(f"{3 * i + 4}.block.1.conv"),
            "conv2": conv(f"{3 * i + 4}.block.3.conv"),
            "shortcut": conv(f"{3 * i + 4}.shortcut.conv"),
        }
    params["conv_out"] = conv("15.conv")
    return {"params": params}


def load_encodec(checkpoint: str) -> Tuple[EncodecEncoder, Dict[str, Any]]:
    """Load a torch EnCodec checkpoint (.pt/.bin/.safetensors state_dict or
    a full-model torch save) and return (module, flax params)."""
    import torch

    obj = torch.load(checkpoint, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    # resident weights: no per-utterance re-upload over the tunnel (r5)
    return EncodecEncoder(), jax.device_put(convert_torch_encodec(obj))


def encode(model: EncodecEncoder, params, wav: np.ndarray) -> np.ndarray:
    """wav (n,) float 24 kHz mono -> (T, 128) float32 embeddings.

    The sample axis is zero-padded to a 20480-sample (64-latent) bucket so
    corpus extraction compiles a handful of shapes instead of one per
    utterance length; the SEANet encoder is causal, so all full latent
    frames are bit-identical to an unpadded forward. When ``n % 320 != 0``
    the final PARTIAL frame sees bucket zeros instead of the exact-length
    conv padding (~4e-4 deviation on a frame that encodes padding either
    way)."""
    t_lat = (len(wav) + HOP - 1) // HOP
    nb = ((len(wav) + 64 * HOP - 1) // (64 * HOP)) * (64 * HOP)
    wp = np.pad(np.asarray(wav, np.float32), (0, nb - len(wav)))
    out = jax.jit(model.apply)(params, jnp.asarray(wp)[None])
    return np.asarray(out[0], np.float32)[:t_lat]

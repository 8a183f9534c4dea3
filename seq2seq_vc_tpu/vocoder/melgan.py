"""MelGAN + StyleMelGAN generators (flax.linen).

Completes the parallel_wavegan generator family the reference's
``vocoder/vocoder.py:36-39`` can load via ``load_model`` (PWG and HiFi-GAN
live in ``pwg.py`` / ``hifigan.py``): MelGAN's stride-halved transposed-conv
stack with dilated residual stacks, and StyleMelGAN's TADE-conditioned
noise-upsampling generator with softmax-gated tanh activations. Channel-last
layout; transposed convs compute the full VALID output then crop torch's
``ConvTranspose1d(kernel=2s, stride=s, padding=s//2+s%2,
output_padding=s%2)`` arithmetic exactly, so torch checkpoints convert
tap-for-tap (``torch_melgan_to_flax`` / ``torch_style_melgan_to_flax``
resolve weight-normed checkpoints to effective kernels — the reference
calls ``remove_weight_norm()`` at load time, ``vocoder/vocoder.py:37``).

bf16 compute default for the same TPU conv-lowering reason as HiFi-GAN;
parity tests run fp32.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Mapping, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .convert_torch import _conv, _conv_transpose


def _reflect_pad_t(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="reflect")


class ConvTransposeTorchPad(nn.Module):
    """Transposed conv with torch ``ConvTranspose1d(kernel=2s, stride=s,
    padding=s//2 + s%2, output_padding=s%2)`` semantics (exact T -> T*s)."""

    features: int
    stride: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        s = self.stride
        y = nn.ConvTranspose(
            self.features, (2 * s,), strides=(s,), padding="VALID",
            dtype=self.dtype, name="conv",
        )(x)
        left = s // 2 + s % 2
        right = s // 2
        return y[:, left : y.shape[1] - right]


class ResidualStack(nn.Module):
    """MelGAN residual stack: leaky-relu -> reflect-pad dilated conv ->
    leaky-relu -> 1x1, plus a 1x1 skip."""

    channels: int
    kernel_size: int = 3
    dilation: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        y = nn.leaky_relu(x, 0.2)
        y = _reflect_pad_t(y, (self.kernel_size - 1) // 2 * self.dilation)
        y = nn.Conv(
            self.channels, (self.kernel_size,), kernel_dilation=self.dilation,
            padding="VALID", dtype=self.dtype, name="conv_dil",
        )(y)
        y = nn.leaky_relu(y, 0.2)
        y = nn.Conv(self.channels, (1,), dtype=self.dtype, name="conv_1x1")(y)
        s = nn.Conv(self.channels, (1,), dtype=self.dtype, name="skip")(x)
        return y + s


class MelGANGenerator(nn.Module):
    """parallel_wavegan-style MelGAN generator (non-causal)."""

    in_channels: int = 80
    out_channels: int = 1
    kernel_size: int = 7
    channels: int = 512
    upsample_scales: Sequence[int] = (8, 8, 2, 2)
    stack_kernel_size: int = 3
    stacks: int = 3
    use_final_nonlinear_activation: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, c):
        """Mel (B, T, in_channels) -> waveform (B, T * prod(scales))."""
        x = _reflect_pad_t(c.astype(self.dtype), (self.kernel_size - 1) // 2)
        x = nn.Conv(
            self.channels, (self.kernel_size,), padding="VALID",
            dtype=self.dtype, name="conv_in",
        )(x)
        ch = self.channels
        for i, s in enumerate(self.upsample_scales):
            ch //= 2
            x = nn.leaky_relu(x, 0.2)
            x = ConvTransposeTorchPad(ch, s, self.dtype, name=f"up_{i}")(x)
            for j in range(self.stacks):
                x = ResidualStack(
                    ch, self.stack_kernel_size, self.stack_kernel_size ** j,
                    self.dtype, name=f"stack_{i}_{j}",
                )(x)
        x = nn.leaky_relu(x, 0.2)
        x = _reflect_pad_t(x, (self.kernel_size - 1) // 2)
        x = nn.Conv(
            self.out_channels, (self.kernel_size,), padding="VALID",
            dtype=self.dtype, name="conv_out",
        )(x)
        if self.use_final_nonlinear_activation:
            x = jnp.tanh(x)
        return x.astype(jnp.float32)[..., 0]


# --------------------------------------------------------------- StyleMelGAN
class TADELayer(nn.Module):
    """TADE: instance-norm x, conv the (upsampled) condition into per-frame
    scale/shift. Returns the modulated x and the conv-projected condition
    (consumed as the next layer's condition, as in the torch original)."""

    in_channels: int = 64
    aux_channels: int = 80
    kernel_size: int = 9
    upsample_factor: int = 2
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, c):
        mu = jnp.mean(x, axis=1, keepdims=True)
        var = jnp.var(x, axis=1, keepdims=True)
        x = (x - mu) * jax.lax.rsqrt(var + 1e-5)
        if self.upsample_factor > 1:
            c = jnp.repeat(c, self.upsample_factor, axis=1)
            x = jnp.repeat(x, self.upsample_factor, axis=1)
        c = nn.Conv(
            self.in_channels, (self.kernel_size,), padding="SAME",
            dtype=self.dtype, name="aux_conv",
        )(c)
        cg = nn.Conv(
            2 * self.in_channels, (self.kernel_size,), padding="SAME",
            dtype=self.dtype, name="gated_conv",
        )(c)
        gamma, beta = jnp.split(cg, 2, axis=-1)
        return gamma * x + beta, c


class TADEResBlock(nn.Module):
    """StyleMelGAN block: two TADE + softmax-gated-tanh convs, upsampled
    residual."""

    in_channels: int = 64
    aux_channels: int = 80
    kernel_size: int = 9
    dilation: int = 2
    upsample_factor: int = 2
    gated_function: str = "softmax"
    dtype: Any = jnp.bfloat16

    def _gate(self, a):
        if self.gated_function == "softmax":
            return jax.nn.softmax(a, axis=-1)
        return jax.nn.sigmoid(a)

    @nn.compact
    def __call__(self, x, c):
        residual = x
        x, c = TADELayer(
            self.in_channels, self.aux_channels, self.kernel_size, 1,
            self.dtype, name="tade1",
        )(x, c)
        x = nn.Conv(
            2 * self.in_channels, (self.kernel_size,), padding="SAME",
            dtype=self.dtype, name="gated_conv1",
        )(x)
        a, b = jnp.split(x, 2, axis=-1)
        x = self._gate(a) * jnp.tanh(b)
        x, c = TADELayer(
            self.in_channels, self.in_channels, self.kernel_size,
            self.upsample_factor, self.dtype, name="tade2",
        )(x, c)
        x = nn.Conv(
            2 * self.in_channels, (self.kernel_size,),
            kernel_dilation=self.dilation, padding="SAME",
            dtype=self.dtype, name="gated_conv2",
        )(x)
        a, b = jnp.split(x, 2, axis=-1)
        x = self._gate(a) * jnp.tanh(b)
        if self.upsample_factor > 1:
            residual = jnp.repeat(residual, self.upsample_factor, axis=1)
        return residual + x, c


class StyleMelGANGenerator(nn.Module):
    """parallel_wavegan-style StyleMelGAN generator.

    Noise (B, ceil(T/noise_factor), in_channels) is transposed-conv
    upsampled to >= T frames; the mel condition is edge-padded to that
    length and both run through the TADEResBlock chain (each block
    upsamples x and c together); output trimmed to T * prod(scales).
    """

    in_channels: int = 128
    aux_channels: int = 80
    channels: int = 64
    out_channels: int = 1
    kernel_size: int = 9
    dilation: int = 2
    noise_upsample_scales: Sequence[int] = (11, 2, 2, 2)
    upsample_scales: Sequence[int] = (2, 2, 2, 2, 2, 2, 2, 2, 1)
    gated_function: str = "softmax"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, c, z: Optional[jnp.ndarray] = None,
                 rng: Optional[jax.Array] = None):
        """Mel (B, T, aux) -> waveform (B, T * prod(upsample_scales))."""
        noise_factor = int(np.prod(self.noise_upsample_scales))
        up_factor = int(np.prod(self.upsample_scales))
        B, T, _ = c.shape
        if z is None:
            key = rng if rng is not None else self.make_rng("noise")
            z = jax.random.normal(
                key, (B, math.ceil(T / noise_factor), self.in_channels)
            )
        x = z.astype(self.dtype)
        for i, s in enumerate(self.noise_upsample_scales):
            x = ConvTransposeTorchPad(
                self.channels, s, self.dtype, name=f"noise_up_{i}"
            )(x)
            x = nn.leaky_relu(x, 0.2)
        # replicate-pad the condition to the noise-upsampled length
        # (torch inference: F.pad(c, (0, x_len - c_len), "replicate"))
        pad = x.shape[1] - T
        c = jnp.pad(
            c.astype(self.dtype), ((0, 0), (0, pad), (0, 0)), mode="edge"
        )
        aux = self.aux_channels
        for i, s in enumerate(self.upsample_scales):
            x, c = TADEResBlock(
                self.channels, aux, self.kernel_size, self.dilation, s,
                self.gated_function, self.dtype, name=f"block_{i}",
            )(x, c)
            aux = self.channels
        x = nn.Conv(
            self.out_channels, (self.kernel_size,), padding="SAME",
            dtype=self.dtype, name="output_conv",
        )(x)
        x = jnp.tanh(x)
        return x.astype(jnp.float32)[:, : T * up_factor, 0]


# ---------------------------------------------------------------- conversion
def torch_melgan_to_flax(
    state_dict: Mapping[str, Any],
    flax_params: Dict[str, Any],
    upsample_scales: Sequence[int],
    stacks: int,
) -> Dict[str, Any]:
    """Map a parallel_wavegan MelGANGenerator state dict into our flax tree.

    Torch layout is one flat ``melgan.{idx}`` Sequential (non-causal):
    [pad, conv_in] + per stage [act, conv_transpose, stack x S] + [act, pad,
    conv_out, (tanh)]; each ResidualStack holds ``stack.2`` (dilated conv),
    ``stack.4`` (1x1) and ``skip_layer``. Weight-normed entries are
    resolved to effective kernels.
    """
    sd = {k.removeprefix("module."): np.asarray(v) for k, v in state_dict.items()}
    out = jax.tree_util.tree_map(np.asarray, flax_params)
    pp = out["params"]

    def put(node, name, w, b):
        assert node[name]["kernel"].shape == w.shape, (
            name, node[name]["kernel"].shape, w.shape,
        )
        node[name]["kernel"] = w
        node[name]["bias"] = b

    idx = 1  # 0 is the reflection pad
    put(pp, "conv_in", *_conv(sd, f"melgan.{idx}"))
    idx += 1
    for i in range(len(upsample_scales)):
        idx += 1  # activation
        w, b = _conv_transpose(sd, f"melgan.{idx}")
        put(pp[f"up_{i}"], "conv", w, b)
        idx += 1
        for j in range(stacks):
            blk = pp[f"stack_{i}_{j}"]
            put(blk, "conv_dil", *_conv(sd, f"melgan.{idx}.stack.2"))
            put(blk, "conv_1x1", *_conv(sd, f"melgan.{idx}.stack.4"))
            put(blk, "skip", *_conv(sd, f"melgan.{idx}.skip_layer"))
            idx += 1
    idx += 2  # activation + pad
    put(pp, "conv_out", *_conv(sd, f"melgan.{idx}"))
    return out


def torch_style_melgan_to_flax(
    state_dict: Mapping[str, Any],
    flax_params: Dict[str, Any],
    n_noise_upsamples: int,
    n_blocks: int,
) -> Dict[str, Any]:
    """Map a parallel_wavegan StyleMelGANGenerator state dict into flax.

    Torch layout: ``noise_upsample.{2i}`` transposed convs (odd indices are
    activations), ``blocks.{i}.{tade1,tade2}.{aux_conv,gated_conv}.0``,
    ``blocks.{i}.gated_conv{1,2}``, ``output_conv.0``.
    """
    sd = {k.removeprefix("module."): np.asarray(v) for k, v in state_dict.items()}
    out = jax.tree_util.tree_map(np.asarray, flax_params)
    pp = out["params"]

    def put(node, name, w, b):
        assert node[name]["kernel"].shape == w.shape, (
            name, node[name]["kernel"].shape, w.shape,
        )
        node[name]["kernel"] = w
        node[name]["bias"] = b

    for i in range(n_noise_upsamples):
        w, b = _conv_transpose(sd, f"noise_upsample.{2 * i}")
        put(pp[f"noise_up_{i}"], "conv", w, b)
    for i in range(n_blocks):
        blk = pp[f"block_{i}"]
        for t in ("tade1", "tade2"):
            put(blk[t], "aux_conv", *_conv(sd, f"blocks.{i}.{t}.aux_conv.0"))
            put(blk[t], "gated_conv", *_conv(sd, f"blocks.{i}.{t}.gated_conv.0"))
        put(blk, "gated_conv1", *_conv(sd, f"blocks.{i}.gated_conv1"))
        put(blk, "gated_conv2", *_conv(sd, f"blocks.{i}.gated_conv2"))
    put(pp, "output_conv", *_conv(sd, "output_conv.0"))
    return out


# ------------------------------------------------------------------ backends
def _load_generator_params(config_path: Optional[str], keys) -> Dict[str, Any]:
    if not config_path:
        return {}
    import yaml

    with open(config_path) as f:
        g = (yaml.safe_load(f) or {}).get("generator_params", {})
    cfg = {k: g[k] for k in keys if k in g}
    for k in ("upsample_scales", "noise_upsample_scales"):
        if k in cfg:
            cfg[k] = tuple(cfg[k])
    return cfg


def _torch_generator_sd(checkpoint: str) -> Dict[str, np.ndarray]:
    import torch

    ckpt = torch.load(checkpoint, map_location="cpu", weights_only=False)
    sd = ckpt
    for k in ("model", "generator"):
        if isinstance(sd, dict) and k in sd:
            sd = sd[k]
    return {k: np.asarray(v) for k, v in sd.items()}


def load_melgan_backend(checkpoint: str, config_path: Optional[str] = None):
    """(T, aux) mel -> (N,) waveform callable from a torch MelGAN ckpt."""
    cfg = _load_generator_params(
        config_path,
        ("in_channels", "out_channels", "kernel_size", "channels",
         "upsample_scales", "stack_kernel_size", "stacks",
         "use_final_nonlinear_activation"),
    )
    model = MelGANGenerator(**cfg)
    dummy = np.zeros((1, 8, model.in_channels), np.float32)
    template = jax.jit(
        lambda d: model.init({"params": jax.random.PRNGKey(0)}, d)
    )(dummy)
    params = torch_melgan_to_flax(
        _torch_generator_sd(checkpoint), template,
        model.upsample_scales, model.stacks,
    )
    params = jax.device_put(params)  # resident weights: no per-utt re-upload
    fn = jax.jit(lambda p, feats: model.apply(p, feats))
    hop = int(np.prod(model.upsample_scales))

    def backend(feats: np.ndarray) -> np.ndarray:
        # 64-frame bucket pad: bounded compile-shape set (same rationale as
        # pwg.py's backend); edge padding only perturbs the trimmed tail
        t = feats.shape[0]
        tb = ((t + 63) // 64) * 64
        fp = np.pad(np.asarray(feats, np.float32), ((0, tb - t), (0, 0)),
                    mode="edge")
        y = fn(params, jnp.asarray(fp)[None])
        return np.asarray(y[0])[: t * hop]

    return backend


def load_style_melgan_backend(
    checkpoint: str, config_path: Optional[str] = None, seed: int = 0
):
    """(T, aux) mel -> (N,) waveform callable from a torch StyleMelGAN ckpt."""
    cfg = _load_generator_params(
        config_path,
        ("in_channels", "aux_channels", "channels", "out_channels",
         "kernel_size", "dilation", "noise_upsample_scales",
         "upsample_scales", "gated_function"),
    )
    model = StyleMelGANGenerator(**cfg)
    dummy = np.zeros((1, 8, model.aux_channels), np.float32)
    template = jax.jit(
        lambda d, s: model.init(
            {"params": jax.random.PRNGKey(s), "noise": jax.random.PRNGKey(s + 1)},
            d,
        )
    )(dummy, seed)
    params = torch_style_melgan_to_flax(
        _torch_generator_sd(checkpoint), template,
        len(model.noise_upsample_scales), len(model.upsample_scales),
    )
    params = jax.device_put(params)  # resident weights: no per-utt re-upload
    fn = jax.jit(lambda p, feats, key: model.apply(p, feats, rng=key))
    hop = int(np.prod(model.upsample_scales))

    def backend(feats: np.ndarray) -> np.ndarray:
        t = feats.shape[0]
        tb = ((t + 63) // 64) * 64
        fp = np.pad(np.asarray(feats, np.float32), ((0, tb - t), (0, 0)),
                    mode="edge")
        y = fn(params, jnp.asarray(fp)[None], jax.random.PRNGKey(seed))
        return np.asarray(y[0])[: t * hop]

    return backend

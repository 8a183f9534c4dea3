"""Parallel WaveGAN generator (flax.linen).

The reference's default arctic vocoder family is parallel_wavegan
checkpoints (PWG/HiFi-GAN, reference ``vocoder/vocoder.py:36-39``); this is
the PWG half: a non-autoregressive WaveNet — gaussian noise in, 30 gated
residual blocks with dilations 2^(i % 10) conditioned on nearest-upsampled
mel, skip-sum head — plus a torch->flax checkpoint converter mirroring
``convert_torch.py``. bf16 compute for the same TPU conv-lowering reason as
HiFi-GAN.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class ResidualBlock(nn.Module):
    """WaveNet gated residual block with aux conditioning."""

    residual_channels: int = 64
    gate_channels: int = 128
    skip_channels: int = 64
    aux_channels: int = 80
    kernel_size: int = 3
    dilation: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, c):
        """x: (B, T, residual); c: (B, T, aux) -> (residual out, skip)."""
        h = nn.Conv(
            self.gate_channels, (self.kernel_size,),
            kernel_dilation=self.dilation, padding="SAME",
            dtype=self.dtype, name="conv",
        )(x)
        ca = nn.Conv(
            self.gate_channels, (1,), use_bias=False, dtype=self.dtype, name="conv1x1_aux"
        )(c)
        h = h + ca
        a, b = jnp.split(h, 2, axis=-1)
        z = jnp.tanh(a) * jax.nn.sigmoid(b)
        res = nn.Conv(self.residual_channels, (1,), dtype=self.dtype, name="conv1x1_out")(z)
        skip = nn.Conv(self.skip_channels, (1,), dtype=self.dtype, name="conv1x1_skip")(z)
        return (x + res) * np.sqrt(0.5), skip


class UpsampleNetwork(nn.Module):
    """Nearest-upsample mel to the waveform rate with conv smoothing."""

    upsample_scales: Sequence[int] = (4, 4, 4, 4)
    aux_channels: int = 80
    aux_context_window: int = 2
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, c):
        """c: (B, T_mel, aux) -> (B, T_mel * prod(scales), aux)."""
        # leading context conv (ConvInUpsampleNetwork)
        k = 2 * self.aux_context_window + 1
        c = nn.Conv(self.aux_channels, (k,), padding="SAME", dtype=self.dtype,
                    name="conv_in")(c)
        for i, s in enumerate(self.upsample_scales):
            c = jnp.repeat(c, s, axis=1)  # nearest upsample
            # smoothing conv over time (torch uses conv2d k=(1, 2s+1))
            c = nn.Conv(self.aux_channels, (2 * s + 1,), padding="SAME",
                        use_bias=False, dtype=self.dtype, name=f"smooth_{i}")(c)
        return c


class ParallelWaveGANGenerator(nn.Module):
    in_channels: int = 1
    out_channels: int = 1
    kernel_size: int = 3
    layers: int = 30
    stacks: int = 3
    residual_channels: int = 64
    gate_channels: int = 128
    skip_channels: int = 64
    aux_channels: int = 80
    aux_context_window: int = 2
    upsample_scales: Sequence[int] = (4, 4, 4, 4)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, c, z=None, rng: Optional[jax.Array] = None):
        """Mel (B, T_mel, aux) -> waveform (B, T_mel * hop).

        z: optional gaussian noise (B, T_wav, 1); sampled from ``rng`` (or
        the 'noise' collection) when absent.
        """
        hop = int(np.prod(self.upsample_scales))
        B, T_mel, _ = c.shape
        t_wav = T_mel * hop
        if z is None:
            key = rng if rng is not None else self.make_rng("noise")
            z = jax.random.normal(key, (B, t_wav, self.in_channels))

        c_up = UpsampleNetwork(
            self.upsample_scales, self.aux_channels, self.aux_context_window,
            self.dtype, name="upsample_net",
        )(c)

        x = nn.Conv(self.residual_channels, (1,), dtype=self.dtype, name="first_conv")(z)
        layers_per_stack = self.layers // self.stacks
        skips = 0.0
        for i in range(self.layers):
            dilation = 2 ** (i % layers_per_stack)
            x, s = ResidualBlock(
                self.residual_channels, self.gate_channels, self.skip_channels,
                self.aux_channels, self.kernel_size, dilation, self.dtype,
                name=f"block_{i}",
            )(x, c_up)
            skips = skips + s
        skips = skips * np.sqrt(1.0 / self.layers)

        h = nn.relu(skips)
        h = nn.Conv(self.skip_channels, (1,), dtype=self.dtype, name="last_conv_0")(h)
        h = nn.relu(h)
        h = nn.Conv(self.out_channels, (1,), dtype=self.dtype, name="last_conv_1")(h)
        return h.astype(jnp.float32)[..., 0]


# ---------------------------------------------------------------- conversion
def _t_conv(sd: Mapping[str, Any], prefix: str):
    """torch Conv1d (out, in, k) -> flax (k, in, out) [+ bias]."""
    w = np.asarray(sd[f"{prefix}.weight"], np.float32).transpose(2, 1, 0)
    b = sd.get(f"{prefix}.bias")
    return w, (None if b is None else np.asarray(b, np.float32))


def torch_pwg_to_flax(state_dict: Mapping[str, Any], flax_params: Dict[str, Any]) -> Dict[str, Any]:
    """Map a parallel_wavegan PWG generator state dict into our flax tree.

    Expected torch layout (parallel_wavegan.models.ParallelWaveGANGenerator):
    ``first_conv``, ``conv_layers.{i}.{conv,conv1x1_aux,conv1x1_out,
    conv1x1_skip}``, ``upsample_net.conv_in.conv`` +
    ``upsample_net.upsample.up_layers`` conv2ds, ``last_conv_layers.{1,3}``.
    """
    sd = {k.removeprefix("module."): np.asarray(v) for k, v in state_dict.items()}
    out = jax.tree_util.tree_map(np.asarray, flax_params)
    pp = out["params"]

    def put(node, name, prefix):
        w, b = _t_conv(sd, prefix)
        assert node[name]["kernel"].shape == w.shape, (name, node[name]["kernel"].shape, w.shape)
        node[name]["kernel"] = w
        if b is not None and "bias" in node[name]:
            node[name]["bias"] = b

    put(pp, "first_conv", "first_conv")
    n_layers = len([k for k in sd if k.endswith(".conv1x1_out.weight")])
    for i in range(n_layers):
        blk = pp[f"block_{i}"]
        put(blk, "conv", f"conv_layers.{i}.conv")
        put(blk, "conv1x1_aux", f"conv_layers.{i}.conv1x1_aux")
        put(blk, "conv1x1_out", f"conv_layers.{i}.conv1x1_out")
        put(blk, "conv1x1_skip", f"conv_layers.{i}.conv1x1_skip")
    up = pp["upsample_net"]
    put(up, "conv_in", "upsample_net.conv_in.conv")
    # upsample smoothing convs are torch conv2d (1, 2s+1) over (C=1 image);
    # squeeze to 1D: (out=1, in=1, 1, k) -> depthwise over aux via broadcast
    smooth_keys = sorted(
        k for k in sd if ".up_layers." in k and k.endswith(".weight") and sd[k].ndim == 4
    )
    for i, k in enumerate(smooth_keys):
        w2d = sd[k]  # (1, 1, 1, K)
        kk = w2d.shape[-1]
        name = f"smooth_{i}"
        tgt = up[name]["kernel"]  # (kk, aux, aux)
        w1d = np.zeros_like(tgt)
        for cch in range(tgt.shape[1]):
            w1d[:, cch, cch] = w2d[0, 0, 0, :]
        up[name]["kernel"] = w1d
    put(pp, "last_conv_0", "last_conv_layers.1")
    put(pp, "last_conv_1", "last_conv_layers.3")
    return out


def load_pwg_backend(checkpoint: str, config_path: Optional[str] = None, seed: int = 0):
    """(T, aux) mel -> (N,) waveform callable from a torch PWG checkpoint."""
    import torch
    import yaml

    gen_cfg: Dict[str, Any] = {}
    if config_path:
        with open(config_path) as f:
            full = yaml.safe_load(f)
        g = full.get("generator_params", {})
        gen_cfg = {
            k: g[k]
            for k in (
                "layers", "stacks", "residual_channels", "gate_channels",
                "skip_channels", "aux_channels", "aux_context_window",
            )
            if k in g
        }
        if "upsample_params" in g and "upsample_scales" in g["upsample_params"]:
            gen_cfg["upsample_scales"] = tuple(g["upsample_params"]["upsample_scales"])
    model = ParallelWaveGANGenerator(**gen_cfg)

    ckpt = torch.load(checkpoint, map_location="cpu", weights_only=False)
    sd = ckpt
    for k in ("model", "generator"):
        if isinstance(sd, dict) and k in sd:
            sd = sd[k]
    sd = {k: v for k, v in sd.items()}

    dummy = np.zeros((1, 8, model.aux_channels), np.float32)
    template = jax.jit(
        lambda d, s: model.init({"params": jax.random.PRNGKey(s), "noise": jax.random.PRNGKey(s + 1)}, d)
    )(dummy, seed)
    params = torch_pwg_to_flax({k: v.numpy() for k, v in sd.items()}, template)
    params = jax.device_put(params)  # resident weights: no per-utt re-upload

    fn = jax.jit(lambda p, feats, key: model.apply(p, feats, rng=key))
    hop = int(np.prod(model.upsample_scales))

    def backend(feats: np.ndarray) -> np.ndarray:
        # bucket-pad the frame axis: decode trims features to exact
        # per-utterance lengths, and a per-length jit would recompile the
        # vocoder for every utterance (minutes each over a remote-compile
        # tunnel). Edge-padding only perturbs the last receptive field's
        # worth of samples of the trimmed tail's context.
        t = feats.shape[0]
        tb = ((t + 63) // 64) * 64
        fp = np.pad(
            np.asarray(feats, np.float32), ((0, tb - t), (0, 0)), mode="edge"
        )
        y = fn(params, jnp.asarray(fp)[None], jax.random.PRNGKey(seed))
        return np.asarray(y[0])[: t * hop]

    return backend

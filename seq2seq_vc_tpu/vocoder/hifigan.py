"""HiFi-GAN generator + discriminators (flax.linen).

Capability match with reference ``urhythmic/vocoder.py:23-455`` (jik876
HiFi-GAN): conv_pre -> [transposed-conv upsample -> multi-receptive-field
ResBlock fusion] x N -> conv_post/tanh generator, multi-period and
multi-scale discriminators, LSGAN + feature-matching losses. Channel-last
layout; transposed convs compute the full VALID output then crop
``(k - u) // 2`` per side, which is bit-equivalent to torch's
ConvTranspose1d padding arithmetic (enables torch checkpoint conversion).
Weight norm matches the reference's training-time parameterization.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

LRELU_SLOPE = 0.1


def _wn(conv: nn.Module) -> nn.Module:
    return nn.WeightNorm(conv)


class ResBlock(nn.Module):
    channels: int
    kernel_size: int = 3
    dilations: Sequence[int] = (1, 3, 5)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        for d in self.dilations:
            y = nn.leaky_relu(x, LRELU_SLOPE)
            y = _wn(nn.Conv(self.channels, (self.kernel_size,),
                            kernel_dilation=d, padding="SAME", dtype=self.dtype))(y)
            y = nn.leaky_relu(y, LRELU_SLOPE)
            y = _wn(nn.Conv(self.channels, (self.kernel_size,), padding="SAME",
                            dtype=self.dtype))(y)
            x = x + y
        return x


class ConvTranspose1dTorch(nn.Module):
    """Transposed conv with torch ConvTranspose1d(padding=(k-u)//2) semantics."""

    features: int
    kernel_size: int
    stride: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        y = _wn(
            nn.ConvTranspose(
                self.features, (self.kernel_size,), strides=(self.stride,),
                padding="VALID", dtype=self.dtype,
            )
        )(x)
        crop = (self.kernel_size - self.stride) // 2
        if crop > 0:
            y = y[:, crop:-crop]
        return y


class HifiganGenerator(nn.Module):
    """Mel/unit features (B, T, in_channels) -> waveform (B, T * prod(factors))."""

    in_channels: int = 256
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    upsample_kernel_sizes: Tuple[int, ...] = (20, 16, 4, 4)
    upsample_channels: int = 512
    upsample_factors: Tuple[int, ...] = (10, 8, 2, 2)
    sample_rate: int = 16000
    # bf16 compute: fp32 1D convs lower pathologically on TPU (~0.1 TF/s vs
    # ~75 TF/s in bf16); params stay fp32, the waveform is returned fp32
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        num_kernels = len(self.resblock_kernel_sizes)
        h = _wn(nn.Conv(self.upsample_channels, (5,), padding="SAME",
                        name="conv_pre", dtype=self.dtype))(x)
        for i, (u, k) in enumerate(zip(self.upsample_factors, self.upsample_kernel_sizes)):
            h = nn.leaky_relu(h, LRELU_SLOPE)
            ch = self.upsample_channels // (2 ** (i + 1))
            h = ConvTranspose1dTorch(ch, k, u, name=f"up_{i}", dtype=self.dtype)(h)
            z = None
            for j, (rk, rd) in enumerate(
                zip(self.resblock_kernel_sizes, self.resblock_dilation_sizes)
            ):
                r = ResBlock(ch, rk, rd, name=f"resblock_{i}_{j}", dtype=self.dtype)(h)
                z = r if z is None else z + r
            h = z / num_kernels
        h = nn.leaky_relu(h)
        h = _wn(nn.Conv(1, (7,), padding="SAME", name="conv_post", dtype=self.dtype))(h)
        return jnp.tanh(h.astype(jnp.float32))[..., 0]


class PeriodDiscriminator(nn.Module):
    """Reshapes the waveform into (T/p, p) and applies stacked 2D convs."""

    period: int

    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        # x: (B, T) -> (B, ceil(T/p), p, 1)
        b, t = x.shape
        pad = (-t) % self.period
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad)), mode="reflect")
        h = x.reshape(b, -1, self.period)[..., None]
        fmaps = []
        for ch in (32, 128, 512, 1024):
            h = _wn(nn.Conv(ch, (5, 1), strides=(3, 1), padding=((2, 2), (0, 0)),
                            dtype=self.dtype))(h)
            h = nn.leaky_relu(h, LRELU_SLOPE)
            fmaps.append(h)
        h = _wn(nn.Conv(1024, (5, 1), padding=((2, 2), (0, 0)), dtype=self.dtype))(h)
        h = nn.leaky_relu(h, LRELU_SLOPE)
        fmaps.append(h)
        h = _wn(nn.Conv(1, (3, 1), padding=((1, 1), (0, 0)), dtype=self.dtype))(h)
        fmaps.append(h)
        return h.reshape(b, -1).astype(jnp.float32), fmaps


class MultiPeriodDiscriminator(nn.Module):
    periods: Tuple[int, ...] = (2, 3, 5, 7, 11)

    @nn.compact
    def __call__(self, x):
        scores, fmaps = [], []
        for p in self.periods:
            s, f = PeriodDiscriminator(p, name=f"period_{p}")(x)
            scores.append(s)
            fmaps.append(f)
        return scores, fmaps


class ScaleDiscriminator(nn.Module):
    @nn.compact
    def __call__(self, x):
        # x: (B, T) -> (B, T, 1)
        h = x[..., None]
        fmaps = []
        specs = [
            (128, 15, 1, 1),
            (128, 41, 2, 4),
            (256, 41, 2, 16),
            (512, 41, 4, 16),
            (1024, 41, 4, 16),
            (1024, 41, 1, 16),
            (1024, 5, 1, 1),
        ]
        for ch, k, s, groups in specs:
            h = _wn(nn.Conv(ch, (k,), strides=(s,), padding="SAME",
                            feature_group_count=groups, dtype=jnp.bfloat16))(h)
            h = nn.leaky_relu(h, LRELU_SLOPE)
            fmaps.append(h)
        h = _wn(nn.Conv(1, (3,), padding="SAME", dtype=jnp.bfloat16))(h)
        fmaps.append(h)
        return h[..., 0].astype(jnp.float32), fmaps


class MultiScaleDiscriminator(nn.Module):
    n_scales: int = 3

    @nn.compact
    def __call__(self, x):
        scores, fmaps = [], []
        h = x
        for i in range(self.n_scales):
            if i > 0:
                # avg-pool downsample x2 (kernel 4, stride 2, pad 2)
                hp = jnp.pad(h, ((0, 0), (2, 2)), mode="edge")
                idx = jnp.arange(0, hp.shape[1] - 4 + 1, 2)
                h = jnp.mean(
                    hp[:, idx[:, None] + jnp.arange(4)[None, :]], axis=-1
                )
            s, f = ScaleDiscriminator(name=f"scale_{i}")(h)
            scores.append(s)
            fmaps.append(f)
        return scores, fmaps


class HifiganDiscriminator(nn.Module):
    """MPD + MSD combined (reference ``urhythmic/vocoder.py:405+``)."""

    @nn.compact
    def __call__(self, x):
        mpd_s, mpd_f = MultiPeriodDiscriminator(name="mpd")(x)
        msd_s, msd_f = MultiScaleDiscriminator(name="msd")(x)
        return mpd_s + msd_s, mpd_f + msd_f


def discriminator_loss(real_scores, fake_scores):
    """LSGAN discriminator loss: (1-D(x))^2 + D(G(z))^2."""
    loss = 0.0
    for r, f in zip(real_scores, fake_scores):
        loss = loss + jnp.mean((1.0 - r) ** 2) + jnp.mean(f ** 2)
    return loss


def generator_adversarial_loss(fake_scores):
    """LSGAN generator loss: (1-D(G(z)))^2."""
    loss = 0.0
    for f in fake_scores:
        loss = loss + jnp.mean((1.0 - f) ** 2)
    return loss


def feature_matching_loss(real_fmaps, fake_fmaps):
    loss = 0.0
    for rfs, ffs in zip(real_fmaps, fake_fmaps):
        for r, f in zip(rfs, ffs):
            loss = loss + jnp.mean(jnp.abs(r - f))
    return loss


def chunked_generate(
    vocoder: HifiganGenerator,
    params,
    mel: jnp.ndarray,
    chunk_frames: int = 160,
    halo_frames: int = 8,
    apply_fn=None,
) -> jnp.ndarray:
    """Overlap-halo chunked synthesis: (T, D) mel -> (T * hop,) waveform.

    The generator is fully convolutional with a receptive field of a few
    mel frames, so a long utterance can be split into overlapping chunks,
    synthesized as ONE batch (full MXU utilization — single-stream
    low-channel convs underutilize the TPU by ~10x), and re-assembled by
    trimming the halo regions. Interior samples match unchunked synthesis
    up to float tolerance once ``halo_frames`` exceeds the receptive field.
    """
    t, d = mel.shape
    hop = int(np.prod(vocoder.upsample_factors))
    n_chunks = max((t + chunk_frames - 1) // chunk_frames, 1)
    t_pad = n_chunks * chunk_frames
    # edge-pad so halos at the borders see real context
    mel_p = jnp.pad(
        mel, ((halo_frames, t_pad - t + halo_frames), (0, 0)), mode="edge"
    )
    starts = jnp.arange(n_chunks) * chunk_frames
    window = chunk_frames + 2 * halo_frames
    idx = starts[:, None] + jnp.arange(window)[None, :]
    chunks = mel_p[idx]  # (n_chunks, window, D)
    wavs = (apply_fn or vocoder.apply)(params, chunks)  # (n_chunks, window * hop)
    core = wavs[:, halo_frames * hop : (halo_frames + chunk_frames) * hop]
    return core.reshape(-1)[: t * hop]


def load_hifigan_model(checkpoint: str, config_path: Optional[str] = None):
    """Load a saved flax HiFi-GAN checkpoint -> (HifiganGenerator, params).

    Accepts all framework layouts: plain param trees, ``{"model": ...}``
    checkpoints (possibly with a serialized blob), and GAN-trainer bundles
    ``{"generator": ..., "discriminator": ...}``.
    """
    import yaml

    import flax.serialization

    gen_cfg: Dict[str, Any] = {}
    if config_path:
        with open(config_path) as f:
            full = yaml.safe_load(f)
        gen_cfg = full.get("generator_params", {})
    model = HifiganGenerator(**gen_cfg)

    with open(checkpoint, "rb") as f:
        state = flax.serialization.msgpack_restore(f.read())
    if isinstance(state, dict) and "model" in state:
        state = state["model"]
    if isinstance(state, bytes):
        state = flax.serialization.msgpack_restore(state)
    if isinstance(state, dict) and "generator" in state:
        state = state["generator"]
    return model, state  # plain pytree of arrays works directly with apply


def load_hifigan_backend(checkpoint: str, config_path: Optional[str] = None):
    """Build a (T, in_channels) -> (N,) waveform callable from a saved
    flax HiFi-GAN checkpoint (see ``core/checkpoint.py`` format).

    Synthesis goes through ``chunked_generate``: decode trims each
    utterance to its exact frame count, so a full-length jit would
    recompile for EVERY distinct utterance length (minutes each over a
    remote-compile tunnel). Chunking bounds the compiled-shape set to the
    distinct chunk counts (a handful per corpus), batches the chunks for
    MXU utilization, and matches unchunked synthesis on the interior up to
    float tolerance (halo > receptive field)."""
    model, params = load_hifigan_model(checkpoint, config_path)
    # on-device once: host-numpy params passed as jit args re-upload the
    # whole generator over the axon tunnel on EVERY utterance (r5 serving
    # measurement: weight re-upload dominated request latency)
    params = jax.device_put(params)

    fn = jax.jit(lambda p, chunks: model.apply(p, chunks))

    def backend(feats: np.ndarray) -> np.ndarray:
        y = chunked_generate(
            model, params, jnp.asarray(feats, jnp.float32), apply_fn=fn
        )
        return np.asarray(y)

    return backend

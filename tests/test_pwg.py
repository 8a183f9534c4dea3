"""Parallel WaveGAN generator: shape test + torch conversion parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seq2seq_vc_tpu.vocoder.pwg import ParallelWaveGANGenerator, torch_pwg_to_flax


def test_pwg_generator_shapes():
    gen = ParallelWaveGANGenerator(
        layers=6, stacks=2, residual_channels=16, gate_channels=32,
        skip_channels=16, aux_channels=20, upsample_scales=(4, 4),
        dtype=jnp.float32,
    )
    c = jnp.asarray(np.random.default_rng(0).standard_normal((2, 10, 20)), jnp.float32)
    params = gen.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, c)
    y = gen.apply(params, c, rngs={"noise": jax.random.PRNGKey(2)})
    assert y.shape == (2, 160)
    assert np.isfinite(np.asarray(y)).all()


def test_pwg_bucket_padding_interior_parity():
    """The decode backend edge-pads the frame axis to a 64-frame bucket
    (bounded compile-shape set) and trims the waveform; with the same
    noise key the prefix of the padded synthesis matches the unpadded one
    away from the padded tail's receptive field (counter-based PRNG draws
    are prefix-stable)."""
    gen = ParallelWaveGANGenerator(
        layers=6, stacks=2, residual_channels=16, gate_channels=32,
        skip_channels=16, aux_channels=20, upsample_scales=(4, 4),
        dtype=jnp.float32,
    )
    rng = np.random.default_rng(1)
    t, hop = 20, 16
    c = jnp.asarray(rng.standard_normal((1, t, 20)), jnp.float32)
    params = gen.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, c
    )
    key = jax.random.PRNGKey(5)
    y_full = np.asarray(gen.apply(params, c, rng=key))[0]
    c_pad = jnp.asarray(
        np.pad(np.asarray(c), ((0, 0), (0, 12), (0, 0)), mode="edge")
    )
    y_pad = np.asarray(gen.apply(params, c_pad, rng=key))[0]
    assert y_pad.shape[0] == 32 * hop
    n = (t - 8) * hop  # stay clear of the padded tail's receptive field
    np.testing.assert_allclose(y_pad[:n], y_full[:n], atol=1e-4)


def _torch_pwg(layers, stacks, res_ch, gate_ch, skip_ch, aux_ch, scales, ctx=2):
    import torch
    import torch.nn as nn
    import torch.nn.functional as F
    import math

    class Block(nn.Module):
        def __init__(self, dilation):
            super().__init__()
            self.conv = nn.Conv1d(res_ch, gate_ch, 3, dilation=dilation,
                                  padding=dilation)
            self.conv1x1_aux = nn.Conv1d(aux_ch, gate_ch, 1, bias=False)
            self.conv1x1_out = nn.Conv1d(gate_ch // 2, res_ch, 1)
            self.conv1x1_skip = nn.Conv1d(gate_ch // 2, skip_ch, 1)

        def forward(self, x, c):
            h = self.conv(x) + self.conv1x1_aux(c)
            a, b = h.split(h.size(1) // 2, dim=1)
            z = torch.tanh(a) * torch.sigmoid(b)
            return (x + self.conv1x1_out(z)) * math.sqrt(0.5), self.conv1x1_skip(z)

    class ConvIn(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = nn.Conv1d(aux_ch, aux_ch, 2 * ctx + 1,
                                  padding=ctx, bias=False)

        def forward(self, c):
            return self.conv(c)

    class Up(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv_in = ConvIn()
            self.up_layers = nn.ModuleList(
                [nn.Conv2d(1, 1, (1, 2 * s + 1), padding=(0, s), bias=False)
                 for s in scales]
            )
            self.scales = scales

        def forward(self, c):
            c = self.conv_in(c)
            c = c.unsqueeze(1)  # (B, 1, C, T)
            for s, conv in zip(self.scales, self.up_layers):
                c = F.interpolate(c, scale_factor=(1, s), mode="nearest")
                c = conv(c)
            return c.squeeze(1)

    class Gen(nn.Module):
        def __init__(self):
            super().__init__()
            self.first_conv = nn.Conv1d(1, res_ch, 1)
            self.upsample_net = Up()
            self.conv_layers = nn.ModuleList(
                [Block(2 ** (i % (layers // stacks))) for i in range(layers)]
            )
            self.last_conv_layers = nn.ModuleList(
                [nn.ReLU(), nn.Conv1d(skip_ch, skip_ch, 1),
                 nn.ReLU(), nn.Conv1d(skip_ch, 1, 1)]
            )
            self.layers = layers

        def forward(self, z, c):
            c = self.upsample_net(c)
            x = self.first_conv(z)
            skips = 0
            for blk in self.conv_layers:
                x, s = blk(x, c)
                skips = skips + s
            skips = skips * math.sqrt(1.0 / self.layers)
            h = skips
            for l in self.last_conv_layers:
                h = l(h)
            return h

    return Gen()


def test_torch_pwg_conversion_parity():
    import torch

    layers, stacks = 6, 2
    res_ch, gate_ch, skip_ch, aux_ch = 16, 32, 16, 20
    scales = (4, 4)
    tgen = _torch_pwg(layers, stacks, res_ch, gate_ch, skip_ch, aux_ch, scales)
    tgen.eval()

    fgen = ParallelWaveGANGenerator(
        layers=layers, stacks=stacks, residual_channels=res_ch,
        gate_channels=gate_ch, skip_channels=skip_ch, aux_channels=aux_ch,
        upsample_scales=scales, dtype=jnp.float32,
    )
    rng = np.random.default_rng(1)
    c = rng.standard_normal((1, 12, aux_ch)).astype(np.float32)
    z = rng.standard_normal((1, 12 * 16, 1)).astype(np.float32)

    template = fgen.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        jnp.asarray(c),
    )
    sd = {k: v.detach().numpy() for k, v in tgen.state_dict().items()}
    params = torch_pwg_to_flax(sd, template)

    with torch.no_grad():
        want = tgen(
            torch.from_numpy(z.transpose(0, 2, 1)),
            torch.from_numpy(c.transpose(0, 2, 1)),
        )[:, 0].numpy()
    got = np.asarray(fgen.apply(params, jnp.asarray(c), z=jnp.asarray(z)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5)

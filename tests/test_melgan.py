"""MelGAN + StyleMelGAN generators: shapes + torch conversion parity.

Same proof pattern as tests/test_pwg.py: a torch replica of the
parallel_wavegan module layout (state-dict names included, some convs
weight-normed to exercise effective-weight resolution) is built in-test,
its weights converted, and outputs compared. Completes the reference's
``load_model`` generator family (reference vocoder/vocoder.py:36-39).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from seq2seq_vc_tpu.vocoder.melgan import (
    MelGANGenerator,
    StyleMelGANGenerator,
    torch_melgan_to_flax,
    torch_style_melgan_to_flax,
)


MELGAN_KW = dict(
    in_channels=20, out_channels=1, kernel_size=5, channels=32,
    upsample_scales=(4, 3), stack_kernel_size=3, stacks=2,
    dtype=jnp.float32,
)

STYLE_KW = dict(
    in_channels=8, aux_channels=12, channels=16, out_channels=1,
    kernel_size=5, dilation=2, noise_upsample_scales=(5, 2),
    upsample_scales=(2, 2, 1), dtype=jnp.float32,
)


def test_melgan_generator_shapes():
    gen = MelGANGenerator(**MELGAN_KW)
    c = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 10, 20)), jnp.float32
    )
    params = gen.init({"params": jax.random.PRNGKey(0)}, c)
    y = gen.apply(params, c)
    assert y.shape == (2, 120)  # hop = 4 * 3
    assert np.isfinite(np.asarray(y)).all()


def test_style_melgan_generator_shapes():
    gen = StyleMelGANGenerator(**STYLE_KW)
    c = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 10, 12)), jnp.float32
    )
    params = gen.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, c
    )
    y = gen.apply(params, c, rngs={"noise": jax.random.PRNGKey(2)})
    assert y.shape == (2, 40)  # T * prod(upsample_scales)
    assert np.isfinite(np.asarray(y)).all()


def _torch_melgan():
    import torch
    import torch.nn as nn
    from torch.nn.utils import weight_norm

    k = MELGAN_KW["kernel_size"]
    channels = MELGAN_KW["channels"]
    scales = MELGAN_KW["upsample_scales"]
    stacks = MELGAN_KW["stacks"]
    sk = MELGAN_KW["stack_kernel_size"]

    class ResStack(nn.Module):
        def __init__(self, ch, kk, d):
            super().__init__()
            self.stack = nn.Sequential(
                nn.LeakyReLU(0.2),
                nn.ReflectionPad1d((kk - 1) // 2 * d),
                weight_norm(nn.Conv1d(ch, ch, kk, dilation=d)),
                nn.LeakyReLU(0.2),
                weight_norm(nn.Conv1d(ch, ch, 1)),
            )
            self.skip_layer = weight_norm(nn.Conv1d(ch, ch, 1))

        def forward(self, x):
            return self.stack(x) + self.skip_layer(x)

    layers = [
        nn.ReflectionPad1d((k - 1) // 2),
        weight_norm(nn.Conv1d(MELGAN_KW["in_channels"], channels, k)),
    ]
    ch = channels
    for s in scales:
        layers += [
            nn.LeakyReLU(0.2),
            weight_norm(
                nn.ConvTranspose1d(
                    ch, ch // 2, 2 * s, stride=s,
                    padding=s // 2 + s % 2, output_padding=s % 2,
                )
            ),
        ]
        ch //= 2
        for j in range(stacks):
            layers += [ResStack(ch, sk, sk ** j)]
    layers += [
        nn.LeakyReLU(0.2),
        nn.ReflectionPad1d((k - 1) // 2),
        weight_norm(nn.Conv1d(ch, MELGAN_KW["out_channels"], k)),
        nn.Tanh(),
    ]

    class G(nn.Module):
        def __init__(self):
            super().__init__()
            self.melgan = nn.Sequential(*layers)

        def forward(self, c):
            return self.melgan(c)

    torch.manual_seed(0)
    g = G()
    # perturb params away from init symmetry
    with torch.no_grad():
        for p in g.parameters():
            p.add_(0.05 * torch.randn_like(p))
    return g


def test_torch_melgan_conversion_parity():
    import torch

    tg = _torch_melgan()
    tg.eval()
    gen = MelGANGenerator(**MELGAN_KW)
    rng = np.random.default_rng(3)
    c = rng.standard_normal((1, 12, 20)).astype(np.float32)
    template = gen.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(c))
    sd = {kk: v.detach().numpy() for kk, v in tg.state_dict().items()}
    params = torch_melgan_to_flax(
        sd, template, MELGAN_KW["upsample_scales"], MELGAN_KW["stacks"]
    )
    with torch.no_grad():
        y_t = tg(torch.from_numpy(c).transpose(2, 1)).numpy()[0, 0]
    y_j = np.asarray(gen.apply(params, jnp.asarray(c)))[0]
    assert y_j.shape == y_t.shape
    np.testing.assert_allclose(y_j, y_t, atol=1e-5)


def _torch_style_melgan():
    import torch
    import torch.nn as nn
    from torch.nn.utils import weight_norm

    k = STYLE_KW["kernel_size"]
    ch = STYLE_KW["channels"]
    dil = STYLE_KW["dilation"]

    class TADELayerT(nn.Module):
        def __init__(self, in_ch, aux_ch, up):
            super().__init__()
            self.norm = nn.InstanceNorm1d(in_ch)
            self.aux_conv = nn.Sequential(
                weight_norm(nn.Conv1d(aux_ch, in_ch, k, 1, padding=(k - 1) // 2))
            )
            self.gated_conv = nn.Sequential(
                weight_norm(nn.Conv1d(in_ch, in_ch * 2, k, 1, padding=(k - 1) // 2))
            )
            self.up = up

        def _upsample(self, x):
            return torch.repeat_interleave(x, self.up, dim=2) if self.up > 1 else x

        def forward(self, x, c):
            x = self.norm(x)
            c = self._upsample(c)
            c = self.aux_conv(c)
            cg = self.gated_conv(c)
            cg1, cg2 = cg.chunk(2, dim=1)
            return cg1 * self._upsample(x) + cg2, c

    class TADEResBlockT(nn.Module):
        def __init__(self, in_ch, aux_ch, up):
            super().__init__()
            self.tade1 = TADELayerT(in_ch, aux_ch, 1)
            self.gated_conv1 = weight_norm(
                nn.Conv1d(in_ch, in_ch * 2, k, 1, padding=(k - 1) // 2)
            )
            self.tade2 = TADELayerT(in_ch, in_ch, up)
            self.gated_conv2 = weight_norm(
                nn.Conv1d(
                    in_ch, in_ch * 2, k, 1, dilation=dil,
                    padding=(k - 1) // 2 * dil,
                )
            )
            self.up = up

        def forward(self, x, c):
            residual = x
            x, c = self.tade1(x, c)
            xa, xb = self.gated_conv1(x).chunk(2, dim=1)
            x = torch.softmax(xa, dim=1) * torch.tanh(xb)
            x, c = self.tade2(x, c)
            xa, xb = self.gated_conv2(x).chunk(2, dim=1)
            x = torch.softmax(xa, dim=1) * torch.tanh(xb)
            if self.up > 1:
                residual = torch.repeat_interleave(residual, self.up, dim=2)
            return residual + x, c

    class G(nn.Module):
        def __init__(self):
            super().__init__()
            nu = []
            in_chs = STYLE_KW["in_channels"]
            for s in STYLE_KW["noise_upsample_scales"]:
                nu += [
                    weight_norm(
                        nn.ConvTranspose1d(
                            in_chs, ch, 2 * s, stride=s,
                            padding=s // 2 + s % 2, output_padding=s % 2,
                        )
                    ),
                    nn.LeakyReLU(0.2),
                ]
                in_chs = ch
            self.noise_upsample = nn.Sequential(*nu)
            self.blocks = nn.ModuleList()
            aux = STYLE_KW["aux_channels"]
            for s in STYLE_KW["upsample_scales"]:
                self.blocks.append(TADEResBlockT(ch, aux, s))
                aux = ch
            self.output_conv = nn.Sequential(
                weight_norm(
                    nn.Conv1d(
                        ch, STYLE_KW["out_channels"], k, 1,
                        padding=(k - 1) // 2,
                    )
                ),
                nn.Tanh(),
            )

        def inference(self, c, z):
            import torch.nn.functional as F

            x = self.noise_upsample(z)
            total = c.size(2) * int(np.prod(STYLE_KW["upsample_scales"]))
            c = F.pad(c, (0, x.size(2) - c.size(2)), "replicate")
            for b in self.blocks:
                x, c = b(x, c)
            return self.output_conv(x)[..., :total]

    torch.manual_seed(1)
    g = G()
    with torch.no_grad():
        for p in g.parameters():
            p.add_(0.05 * torch.randn_like(p))
    return g


def test_torch_style_melgan_conversion_parity():
    import torch

    tg = _torch_style_melgan()
    tg.eval()
    gen = StyleMelGANGenerator(**STYLE_KW)
    rng = np.random.default_rng(4)
    T = 10
    nf = int(np.prod(STYLE_KW["noise_upsample_scales"]))
    c = rng.standard_normal((1, T, 12)).astype(np.float32)
    z = rng.standard_normal(
        (1, int(np.ceil(T / nf)), STYLE_KW["in_channels"])
    ).astype(np.float32)
    template = gen.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        jnp.asarray(c),
    )
    sd = {kk: v.detach().numpy() for kk, v in tg.state_dict().items()}
    params = torch_style_melgan_to_flax(
        sd, template,
        len(STYLE_KW["noise_upsample_scales"]),
        len(STYLE_KW["upsample_scales"]),
    )
    with torch.no_grad():
        y_t = tg.inference(
            torch.from_numpy(c).transpose(2, 1), torch.from_numpy(z).transpose(2, 1)
        ).numpy()[0, 0]
    y_j = np.asarray(gen.apply(params, jnp.asarray(c), z=jnp.asarray(z)))[0]
    assert y_j.shape == y_t.shape
    np.testing.assert_allclose(y_j, y_t, atol=2e-5)


def test_vocoder_dispatch_routes_melgan(tmp_path):
    """get_vocoder routes generator_type MelGAN/StyleMelGAN checkpoints."""
    import torch
    import yaml

    tg = _torch_melgan()
    ckpt = tmp_path / "melgan.pkl"
    torch.save({"model": {"generator": tg.state_dict()}}, ckpt)
    cfg = {
        "generator_type": "MelGANGenerator",
        "generator_params": {
            k: (list(v) if isinstance(v, tuple) else v)
            for k, v in MELGAN_KW.items()
            if k != "dtype"
        },
        "sampling_rate": 16000,
    }
    cfg_path = tmp_path / "config.yml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    from seq2seq_vc_tpu.vocoder.vocoder import get_vocoder

    voc = get_vocoder(
        {
            "sampling_rate": 16000,
            "vocoder": {
                "checkpoint": str(ckpt),
                "config": str(cfg_path),
            },
        }
    )
    feats = np.random.default_rng(0).standard_normal((9, 20)).astype(np.float32)
    y = voc.decode(feats)
    assert y.shape == (9 * 12,)
    assert np.isfinite(y).all()

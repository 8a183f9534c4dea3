"""Diffusion mel decoders for AAS-VC: DiffSinger-style Gaussian diffusion
(eps-prediction) and ProDiff-style x0-prediction denoiser.

The reference names these decoder branches in its config surface
(``models/aas_vc.py:95-104,207-230``) and hooks their loss into the trainer
(``trainers/aas_vc.py:89-98``), but the classes themselves are absent from
the snapshot — selecting ``decoder_type: diffsinger``/``prodiff`` there
raises ``NameError``. This module implements the surface natively so those
configs actually run, following the published formulations the reference
imports point at (DiffSinger AAAI'22 / DiffWave denoiser; ProDiff as in the
espnet2 ``SpectogramDenoiser`` port whose constructor signature the
reference call matches verbatim).

TPU notes: the sampling loop is a ``lax.scan`` over a static number of
steps (no data-dependent control flow); the denoiser is a stack of gated
dilated 1-D convs + 1x1 convs — MXU-friendly, channel-last, static shapes.
All diffusion math runs in fp32 regardless of the model's compute dtype.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .conv import Conv


def _timestep_embedding(t, dim: int, max_period: float = 10000.0):
    """Sinusoidal diffusion-step embedding. t: (B,) int32 -> (B, dim)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def make_beta_schedule(
    schedule: str, timesteps: int, max_beta: float = 0.06, min_beta: float = 0.1
):
    """Beta schedules. ``linear``: DiffSinger default (1e-4 .. max_beta).
    ``cosine``: Nichol & Dhariwal. ``vpsde``: discretized VP-SDE (Song et
    al.), the espnet2 ProDiff default (min_beta 0.1, max_beta 40)."""
    if schedule == "linear":
        return jnp.linspace(1e-4, max_beta, timesteps, dtype=jnp.float32)
    if schedule == "cosine":
        s = 0.008
        steps = jnp.arange(timesteps + 1, dtype=jnp.float32) / timesteps
        f = jnp.cos((steps + s) / (1 + s) * math.pi / 2) ** 2
        alphas_bar = f / f[0]
        betas = 1.0 - alphas_bar[1:] / alphas_bar[:-1]
        return jnp.clip(betas, 0.0, 0.999)
    if schedule == "vpsde":
        t = jnp.arange(1, timesteps + 1, dtype=jnp.float32)
        return 1.0 - jnp.exp(
            -min_beta / timesteps
            - 0.5 * (max_beta - min_beta) * (2 * t - 1) / timesteps**2
        )
    raise ValueError(f"unknown beta schedule: {schedule!r}")


class DiffNet(nn.Module):
    """Non-causal WaveNet denoiser (DiffWave/DiffSinger family).

    Input x (B, T, out_dim) noisy features, conditioner (B, T, cond_dim),
    diffusion step t (B,) -> predicted noise / clean features
    (B, T, out_dim). Gated dilated convs with per-layer 1x1 conditioner
    projections and a step-embedding bias; skip connections summed and
    projected out.
    """

    out_dim: int
    cond_dim: int
    residual_channels: int = 256
    layers: int = 20
    kernel_size: int = 3
    dilation_cycle_length: int = 4

    @nn.compact
    def __call__(self, x, t, cond):
        rc = self.residual_channels
        # step embedding: sinusoidal -> MLP (swish), DiffWave-style
        temb = _timestep_embedding(t, rc)
        temb = nn.Dense(rc * 4)(temb)
        temb = nn.swish(temb)
        temb = nn.Dense(rc)(temb)

        h = Conv(rc, (1,))(x)
        h = nn.relu(h)
        skips = 0.0
        for i in range(self.layers):
            dil = 2 ** (i % self.dilation_cycle_length)
            y = h + nn.Dense(rc, name=f"step_proj_{i}")(temb)[:, None, :]
            y = Conv(
                2 * rc, (self.kernel_size,), kernel_dilation=(dil,),
                padding="SAME", name=f"dilated_{i}",
            )(y)
            y = y + Conv(2 * rc, (1,), name=f"cond_proj_{i}")(cond)
            gate, filt = jnp.split(y, 2, axis=-1)
            y = jnp.tanh(filt) * nn.sigmoid(gate)
            y = Conv(2 * rc, (1,), name=f"out_proj_{i}")(y)
            res, skip = jnp.split(y, 2, axis=-1)
            h = (h + res) / math.sqrt(2.0)
            skips = skips + skip
        h = skips / math.sqrt(self.layers)
        h = Conv(rc, (1,), name="skip_proj")(h)
        h = nn.relu(h)
        # zero-init output (identity-noise prediction at init stabilizes
        # early training; DiffWave convention)
        h = Conv(
            self.out_dim, (1,), name="final_proj",
            kernel_init=nn.initializers.zeros,
        )(h)
        return h


class GaussianDiffusion(nn.Module):
    """DiffSinger-style eps-prediction diffusion decoder.

    Training ``__call__(cond, x0, masks)`` draws one timestep per item,
    noises x0, and returns ``(noise, eps_hat)`` for the masked L2 loss
    (reference hook ``trainers/aas_vc.py:89-98``). ``inference(cond)``
    ancestral-samples x0 with a ``lax.scan`` over the static step count.
    """

    in_dim: int  # conditioner width (encoder hidden)
    out_dim: int  # feature width (odim * decoder_reduction_factor)
    residual_channels: int = 256
    denoiser_layers: int = 20
    timesteps: int = 100
    beta_schedule: str = "linear"
    max_beta: float = 0.06
    # few-step inference: None/0 = full ancestral DDPM over ``timesteps``;
    # k < timesteps = deterministic DDIM (eta 0) over k evenly spaced steps
    # (k sequential denoiser calls instead of ``timesteps`` — the
    # production decode on latency-bound hardware)
    inference_steps: Optional[int] = None

    def setup(self):
        self.denoise_fn = DiffNet(
            out_dim=self.out_dim,
            cond_dim=self.in_dim,
            residual_channels=self.residual_channels,
            layers=self.denoiser_layers,
        )

    def _schedule(self):
        betas = make_beta_schedule(
            self.beta_schedule, self.timesteps, max_beta=self.max_beta
        )
        alphas_bar = jnp.cumprod(1.0 - betas)
        return betas, alphas_bar

    def __call__(self, cond, x0, masks=None, deterministic: bool = False):
        """cond/x0: (B, T, in_dim)/(B, T, out_dim); masks (B, T) bool non-pad.
        Returns (noise, eps_hat), both (B, T, out_dim)."""
        _, alphas_bar = self._schedule()
        B = x0.shape[0]
        rng = self.make_rng("noise")
        k_t, k_eps = jax.random.split(rng)
        t = jax.random.randint(k_t, (B,), 0, self.timesteps)
        eps = jax.random.normal(k_eps, x0.shape, jnp.float32)
        ab = alphas_bar[t][:, None, None]
        x_t = jnp.sqrt(ab) * x0 + jnp.sqrt(1.0 - ab) * eps
        if masks is not None:
            x_t = jnp.where(masks[..., None], x_t, 0.0)
        eps_hat = self.denoise_fn(x_t, t, cond)
        return eps, eps_hat

    def inference(self, cond, masks=None):
        """Sampling conditioned on ``cond`` -> (B, T, out_dim). Ancestral
        DDPM by default; DDIM subsequence when ``inference_steps`` is set."""
        k = self.inference_steps
        if k and 0 < k < self.timesteps:
            return self._ddim_inference(cond, masks, k)
        betas, alphas_bar = self._schedule()
        alphas = 1.0 - betas
        alphas_bar_prev = jnp.concatenate([jnp.ones((1,)), alphas_bar[:-1]])
        # posterior variance beta_tilde_t
        post_var = betas * (1.0 - alphas_bar_prev) / (1.0 - alphas_bar)
        B, T = cond.shape[0], cond.shape[1]
        rng = self.make_rng("noise")
        rng, k0 = jax.random.split(rng)
        x_init = jax.random.normal(k0, (B, T, self.out_dim), jnp.float32)

        def body(carry, t):
            x, key = carry
            key, kz = jax.random.split(key)
            tb = jnp.full((B,), t, jnp.int32)
            eps_hat = self.denoise_fn(x, tb, cond)
            mean = (
                x - betas[t] / jnp.sqrt(1.0 - alphas_bar[t]) * eps_hat
            ) / jnp.sqrt(alphas[t])
            z = jax.random.normal(kz, x.shape, jnp.float32)
            x = mean + jnp.where(t > 0, jnp.sqrt(post_var[t]), 0.0) * z
            return (x, key), None

        (x, _), _ = jax.lax.scan(
            body, (x_init, rng), jnp.arange(self.timesteps - 1, -1, -1)
        )
        if masks is not None:
            x = jnp.where(masks[..., None], x, 0.0)
        return x

    def _ddim_inference(self, cond, masks, k: int):
        """Deterministic DDIM (eta 0) over ``k`` evenly spaced timesteps:
        x_{t'} = sqrt(ab_{t'}) x0_hat + sqrt(1 - ab_{t'}) eps_hat with
        x0_hat = (x - sqrt(1 - ab_t) eps_hat) / sqrt(ab_t)."""
        _, alphas_bar = self._schedule()
        # k steps from high noise to 0, e.g. T=100, k=4 -> [99, 74, 49, 24]
        ts = jnp.linspace(self.timesteps - 1, 0, k + 1).round().astype(jnp.int32)
        pairs = jnp.stack([ts[:-1], ts[1:]], axis=1)  # (k, 2): t -> t_prev
        B, T = cond.shape[0], cond.shape[1]
        x = jax.random.normal(
            self.make_rng("noise"), (B, T, self.out_dim), jnp.float32
        )

        def body(x, pair):
            t, t_prev = pair[0], pair[1]
            tb = jnp.full((B,), t, jnp.int32)
            eps_hat = self.denoise_fn(x, tb, cond)
            ab_t = alphas_bar[t]
            # the final transition targets the clean sample (ab := 1)
            ab_p = jnp.where(t_prev > 0, alphas_bar[t_prev], 1.0)
            x0_hat = (x - jnp.sqrt(1.0 - ab_t) * eps_hat) / jnp.sqrt(ab_t)
            x = jnp.sqrt(ab_p) * x0_hat + jnp.sqrt(1.0 - ab_p) * eps_hat
            return x, None

        x, _ = jax.lax.scan(body, x, pairs)
        if masks is not None:
            x = jnp.where(masks[..., None], x, 0.0)
        return x


class SpectogramDenoiser(nn.Module):
    """ProDiff-style x0-prediction denoiser (constructor surface matches the
    reference call ``models/aas_vc.py:220-230`` / espnet2 ProDiff; the class
    name reproduces the upstream spelling).

    Training: noise the target to a random step and predict the CLEAN
    features directly — the prediction flows into the trainer's ordinary L1
    loss as ``before_outs``. Inference: iterative x0-prediction sampling
    every ``timescale`` steps (ProDiff's few-step regime: timesteps 4,
    timescale 1 reproduces the paper's 4-iteration generator).
    """

    idim: int  # feature width (odim * decoder_reduction_factor)
    adim: int = 256  # conditioner width
    layers: int = 20
    channels: int = 256
    timesteps: int = 1000
    timescale: int = 1
    max_beta: float = 40.0
    scheduler: str = "vpsde"
    cycle_length: int = 1

    def setup(self):
        self.denoiser = DiffNet(
            out_dim=self.idim,
            cond_dim=self.adim,
            residual_channels=self.channels,
            layers=self.layers,
            dilation_cycle_length=max(1, self.cycle_length),
        )

    def _schedule(self):
        betas = make_beta_schedule(
            self.scheduler, self.timesteps, max_beta=self.max_beta
        )
        alphas_bar = jnp.cumprod(1.0 - betas)
        return betas, alphas_bar

    def __call__(
        self,
        cond,
        ys=None,
        masks=None,
        is_inference: bool = False,
        deterministic: bool = False,
    ):
        """cond (B, T, adim); ys (B, T, idim) clean targets (training).
        Returns the x0 prediction (B, T, idim)."""
        if is_inference:
            return self.inference(cond, masks)
        _, alphas_bar = self._schedule()
        B = ys.shape[0]
        rng = self.make_rng("noise")
        k_t, k_eps = jax.random.split(rng)
        t = jax.random.randint(k_t, (B,), 0, self.timesteps)
        eps = jax.random.normal(k_eps, ys.shape, jnp.float32)
        ab = alphas_bar[t][:, None, None]
        x_t = jnp.sqrt(ab) * ys + jnp.sqrt(1.0 - ab) * eps
        if masks is not None:
            x_t = jnp.where(masks[..., None], x_t, 0.0)
        return self.denoiser(x_t, t, cond)

    def inference(self, cond, masks=None):
        betas, alphas_bar = self._schedule()
        alphas_bar_prev = jnp.concatenate([jnp.ones((1,)), alphas_bar[:-1]])
        post_var = betas * (1.0 - alphas_bar_prev) / (1.0 - alphas_bar)
        c0 = jnp.sqrt(alphas_bar_prev) * betas / (1.0 - alphas_bar)
        c1 = (
            jnp.sqrt(1.0 - betas)
            * (1.0 - alphas_bar_prev)
            / (1.0 - alphas_bar)
        )
        B, T = cond.shape[0], cond.shape[1]
        rng = self.make_rng("noise")
        rng, k0 = jax.random.split(rng)
        x_init = jax.random.normal(k0, (B, T, self.idim), jnp.float32)
        steps = jnp.arange(self.timesteps - 1, -1, -self.timescale)

        def body(carry, t):
            x, key = carry
            key, kz = jax.random.split(key)
            tb = jnp.full((B,), t, jnp.int32)
            x0_hat = self.denoiser(x, tb, cond)
            # posterior q(x_{t-1} | x_t, x0_hat)
            mean = c0[t] * x0_hat + c1[t] * x
            z = jax.random.normal(kz, x.shape, jnp.float32)
            x = mean + jnp.where(t > 0, jnp.sqrt(post_var[t]), 0.0) * z
            return (x, key), None

        (x, _), _ = jax.lax.scan(body, (x_init, rng), steps)
        if masks is not None:
            x = jnp.where(masks[..., None], x, 0.0)
        return x

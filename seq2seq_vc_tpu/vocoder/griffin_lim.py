"""Griffin-Lim vocoder, fully on device.

Capability match with reference ``vocoder/griffin_lim.py`` (logmel ->
pseudo-inverse mel -> linear spectrogram -> iterative phase recovery), but
the whole loop — iSTFT overlap-add, STFT, phase projection — is a jitted
``lax.fori_loop`` on TPU instead of host librosa.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..dsp.mel import mel_filterbank
from ..dsp.stft import hann_window

EPS = 1e-10


def logmel2linear(
    lmspc: np.ndarray,
    fs: int,
    n_fft: int,
    n_mels: int,
    fmin: Optional[float] = None,
    fmax: Optional[float] = None,
) -> np.ndarray:
    """Log-mel (T, n_mels) -> linear magnitude spectrogram (T, n_fft//2+1)."""
    fmin = 0 if fmin is None else fmin
    fmax = fs / 2 if fmax is None else fmax
    mspc = np.power(10.0, np.asarray(lmspc, np.float64))
    mel_basis = mel_filterbank(fs, n_fft, n_mels, fmin, fmax, dtype=np.float64)
    inv_mel_basis = np.linalg.pinv(mel_basis)
    return np.maximum(EPS, (inv_mel_basis @ mspc.T).T).astype(np.float32)


def _stft(x, window, n_fft: int, hop: int):
    pad = n_fft // 2
    xp = jnp.pad(x, (pad, pad), mode="reflect")
    n = 1 + (xp.shape[0] - n_fft) // hop
    idx = jnp.arange(n)[:, None] * hop + jnp.arange(n_fft)[None, :]
    return jnp.fft.rfft(xp[idx] * window[None, :])


def _istft(spec, window, n_fft: int, hop: int, length: int):
    """Overlap-add inverse STFT with window-sum normalization (centered)."""
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1) * window[None, :]
    n = frames.shape[0]
    total = n_fft + hop * (n - 1)
    starts = jnp.arange(n) * hop
    idx = starts[:, None] + jnp.arange(n_fft)[None, :]  # (n, n_fft)
    y = jnp.zeros(total).at[idx.reshape(-1)].add(frames.reshape(-1))
    wsum = jnp.zeros(total).at[idx.reshape(-1)].add(
        jnp.tile(window ** 2, (n,))
    )
    y = y / jnp.maximum(wsum, 1e-11)
    pad = n_fft // 2
    return y[pad : pad + length]


@partial(jax.jit, static_argnames=("n_fft", "n_shift", "n_iter", "length"))
def _griffin_lim_jax(spc, window, n_fft, n_shift, n_iter, length, key):
    angles = jnp.exp(
        2j * jnp.pi * jax.random.uniform(key, spc.shape)
    )

    def body(_, angles):
        y = _istft(spc * angles, window, n_fft, n_shift, length)
        s = _stft(y, window, n_fft, n_shift)[: spc.shape[0]]
        return jnp.exp(1j * jnp.angle(s))

    angles = jax.lax.fori_loop(0, n_iter, body, angles)
    return _istft(spc * angles, window, n_fft, n_shift, length)


def griffin_lim(
    spc: np.ndarray,
    n_fft: int,
    n_shift: int,
    win_length: Optional[int] = None,
    window: str = "hann",
    n_iter: int = 32,
    seed: int = 0,
) -> np.ndarray:
    """Linear magnitude spectrogram (T, n_fft//2+1) -> waveform (N,)."""
    assert window == "hann"
    assert spc.shape[1] == n_fft // 2 + 1
    length = n_shift * (spc.shape[0] - 1) + n_shift  # ~T*hop samples
    # complex FFT ops are unimplemented on some TPU runtimes (axon); the
    # phase-recovery loop runs on the host CPU backend — it is the fallback
    # vocoder, not a production path
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        w = jnp.asarray(hann_window(win_length or n_fft, n_fft))
        y = _griffin_lim_jax(
            jnp.asarray(spc, jnp.complex64),
            w,
            n_fft,
            n_shift,
            n_iter,
            length,
            jax.random.PRNGKey(seed),
        )
    return np.asarray(y, np.float32)


class Spectrogram2Waveform:
    """logmel -> waveform convenience wrapper (reference ``griffin_lim.py:110``)."""

    def __init__(
        self,
        fs: int,
        n_fft: int,
        n_shift: int,
        n_mels: Optional[int] = None,
        win_length: Optional[int] = None,
        window: str = "hann",
        fmin: Optional[float] = None,
        fmax: Optional[float] = None,
        griffin_lim_iters: int = 32,
    ):
        self.fs = fs
        self.logmel2linear = (
            partial(
                logmel2linear, fs=fs, n_fft=n_fft, n_mels=n_mels, fmin=fmin, fmax=fmax
            )
            if n_mels is not None
            else None
        )
        self.griffin_lim = partial(
            griffin_lim,
            n_fft=n_fft,
            n_shift=n_shift,
            win_length=win_length,
            window=window,
            n_iter=griffin_lim_iters,
        )

    def __call__(self, spc: np.ndarray) -> np.ndarray:
        if self.logmel2linear is not None:
            spc = self.logmel2linear(spc)
        return self.griffin_lim(spc)

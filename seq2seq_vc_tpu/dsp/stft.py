"""On-device STFT.

Matches the librosa conventions used by the reference extractor
(reference ``bin/preprocess.py:62-70``): ``center=True`` with reflect
padding of ``n_fft // 2``, periodic Hann window of ``win_length`` centered
inside ``n_fft``, magnitude via rFFT. Implemented as gather-framing +
batched rFFT so XLA lowers it to a single fused kernel; the mel projection
downstream is an MXU matmul.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int, n_fft: int | None = None, dtype=np.float32) -> np.ndarray:
    """Periodic Hann window of ``win_length``, zero-padded centered to ``n_fft``."""
    n = np.arange(win_length)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)
    if n_fft is not None and n_fft > win_length:
        pad = (n_fft - win_length) // 2
        w = np.pad(w, (pad, n_fft - win_length - pad))
    return w.astype(dtype)


def num_frames(n_samples: int, hop_size: int) -> int:
    """Frame count for a centered STFT (librosa: ``1 + n_samples // hop``)."""
    return 1 + n_samples // hop_size


@partial(jax.jit, static_argnames=("fft_size", "hop_size"))
def _stft_mag(audio: jnp.ndarray, window: jnp.ndarray, fft_size: int, hop_size: int) -> jnp.ndarray:
    pad = fft_size // 2
    x = jnp.pad(audio, (pad, pad), mode="reflect")
    n = 1 + (x.shape[0] - fft_size) // hop_size
    idx = jnp.arange(n)[:, None] * hop_size + jnp.arange(fft_size)[None, :]
    frames = x[idx] * window[None, :]
    return jnp.abs(jnp.fft.rfft(frames, axis=-1))


def stft_magnitude(
    audio,
    fft_size: int = 1024,
    hop_size: int = 256,
    win_length: int | None = None,
    window: str = "hann",
) -> jnp.ndarray:
    """Magnitude spectrogram of shape (#frames, 1 + fft_size // 2)."""
    if window != "hann":
        raise ValueError(f"unsupported window: {window}")
    win_length = win_length or fft_size
    w = jnp.asarray(hann_window(win_length, fft_size))
    return _stft_mag(jnp.asarray(audio, dtype=jnp.float32), w, fft_size, hop_size)

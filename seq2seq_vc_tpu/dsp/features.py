"""Log-mel filterbank feature extraction, jitted end to end.

Numerically replicates reference ``bin/preprocess.py:30-92``
(``logmelfilterbank``): reflect-padded centered STFT, Slaney mel basis,
``max(eps, spc @ mel.T)`` with ``eps=1e-10``, log10 by default.

``LogMelExtractor`` bakes the filterbank in as a constant and buckets the
audio length so repeated calls hit the jit cache instead of recompiling per
utterance (offline preprocessing sees thousands of distinct lengths).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .mel import mel_filterbank
from .stft import hann_window, num_frames


@partial(jax.jit, static_argnames=("fft_size", "hop_size", "log_base"))
def _logmel(x, window, mel_basis_t, fft_size, hop_size, log_base):
    # x is already centered-reflect-padded on host (so bucket zero-padding
    # cannot corrupt the trailing frames' reflection content)
    n = 1 + (x.shape[0] - fft_size) // hop_size
    idx = jnp.arange(n)[:, None] * hop_size + jnp.arange(fft_size)[None, :]
    frames = x[idx] * window[None, :]
    spc = jnp.abs(jnp.fft.rfft(frames, axis=-1))
    mel = jnp.maximum(1e-10, jnp.dot(spc, mel_basis_t, preferred_element_type=jnp.float32))
    if log_base is None:
        return jnp.log(mel)
    elif log_base == 10.0:
        return jnp.log10(mel)
    elif log_base == 2.0:
        return jnp.log2(mel)
    raise ValueError(f"{log_base} is not supported.")


class LogMelExtractor:
    """Reusable, jit-cached wav -> log-mel pipeline."""

    def __init__(
        self,
        sampling_rate: int,
        fft_size: int = 1024,
        hop_size: int = 256,
        win_length: int | None = None,
        window: str = "hann",
        num_mels: int = 80,
        fmin: float | None = None,
        fmax: float | None = None,
        log_base: float | None = 10.0,
        bucket_samples: int = 16384,
    ):
        if window != "hann":
            raise ValueError(f"unsupported window: {window}")
        self.sampling_rate = sampling_rate
        self.fft_size = fft_size
        self.hop_size = hop_size
        self.log_base = log_base
        self.bucket_samples = bucket_samples
        fmin = 0 if fmin is None else fmin
        fmax = sampling_rate / 2 if fmax is None else fmax
        self._window = jnp.asarray(hann_window(win_length or fft_size, fft_size))
        self._mel_t = jnp.asarray(
            mel_filterbank(sampling_rate, fft_size, num_mels, fmin, fmax).T
        )

    def __call__(self, audio: np.ndarray) -> np.ndarray:
        """Extract (#frames, num_mels) float32 log-mel for one utterance.

        Pads the waveform up to a bucket boundary (so jit recompiles only
        once per bucket), then slices back to the true frame count.
        """
        audio = np.asarray(audio, dtype=np.float32)
        n_true = num_frames(len(audio), self.hop_size)
        pad = self.fft_size // 2
        x = np.pad(audio, (pad, pad), mode="reflect")
        b = self.bucket_samples
        padded_len = ((len(x) + b - 1) // b) * b
        if padded_len > len(x):
            x = np.pad(x, (0, padded_len - len(x)))
        mel = _logmel(
            jnp.asarray(x), self._window, self._mel_t,
            self.fft_size, self.hop_size, self.log_base,
        )
        return np.asarray(mel[:n_true])


def logmelfilterbank(
    audio,
    sampling_rate,
    fft_size=1024,
    hop_size=256,
    win_length=None,
    window="hann",
    num_mels=80,
    fmin=None,
    fmax=None,
    eps=1e-10,
    log_base=10.0,
):
    """One-shot functional API mirroring the reference signature."""
    del eps  # fixed at 1e-10 inside the kernel, as in the reference default
    extractor = LogMelExtractor(
        sampling_rate, fft_size, hop_size, win_length, window,
        num_mels, fmin, fmax, log_base,
    )
    return extractor(audio)

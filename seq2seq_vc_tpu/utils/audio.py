"""WAV read/write without soundfile (not in this image).

Uses scipy.io.wavfile and normalizes integer PCM to float32 in [-1, 1],
matching the PCM16 scaling the reference applies in
``datasets/dataset.py:150-151``.
"""

from __future__ import annotations

import numpy as np
from scipy.io import wavfile


_PCM_SCALE = {
    np.dtype(np.int16): 2 ** 15,
    np.dtype(np.int32): 2 ** 31,
    np.dtype(np.uint8): 2 ** 7,
}


def read_wav(path: str):
    """Read a wav file -> (audio float32 in [-1, 1] of shape (T,) or (T, C), sr)."""
    sr, data = wavfile.read(path)
    if data.dtype == np.uint8:
        audio = (data.astype(np.float32) - 128.0) / 128.0
    elif data.dtype in _PCM_SCALE:
        audio = data.astype(np.float32) / _PCM_SCALE[data.dtype]
    else:
        audio = data.astype(np.float32)
    return audio, sr


def write_wav(path: str, audio: np.ndarray, sr: int) -> None:
    """Write float audio in [-1, 1] as PCM16 wav."""
    audio = np.asarray(audio, dtype=np.float32)
    audio = np.clip(audio, -1.0, 1.0)
    wavfile.write(path, sr, (audio * (2 ** 15 - 1)).astype(np.int16))

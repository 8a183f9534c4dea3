"""DSP chain tests: STFT/mel numerics vs an independent numpy reference."""

import numpy as np
import pytest

from seq2seq_vc_tpu.dsp import (
    LogMelExtractor,
    RunningStats,
    hann_window,
    hz_to_mel,
    logmelfilterbank,
    mel_filterbank,
    mel_to_hz,
    normalize,
    denormalize,
    num_frames,
    stft_magnitude,
)


def _np_stft_mag(audio, n_fft, hop):
    """Independent numpy reference: centered reflect-pad STFT, periodic hann."""
    w = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n_fft) / n_fft)
    pad = n_fft // 2
    x = np.pad(audio, pad, mode="reflect")
    n = 1 + (len(x) - n_fft) // hop
    frames = np.stack([x[i * hop : i * hop + n_fft] * w for i in range(n)])
    return np.abs(np.fft.rfft(frames, axis=-1))


def test_mel_scale_roundtrip():
    f = np.array([0.0, 200.0, 999.0, 1000.0, 4000.0, 11025.0])
    np.testing.assert_allclose(mel_to_hz(hz_to_mel(f)), f, rtol=1e-10)


def test_mel_scale_slaney_breakpoint():
    # linear region: 1000 Hz -> 15 mel exactly in the Slaney formulation
    assert hz_to_mel(1000.0) == pytest.approx(15.0)
    assert hz_to_mel(500.0) == pytest.approx(7.5)


def test_mel_filterbank_shape_and_partition():
    fb = mel_filterbank(sr=16000, n_fft=1024, n_mels=80)
    assert fb.shape == (80, 513)
    assert (fb >= 0).all()
    # each filter has some support; peaks move monotonically
    peaks = fb.argmax(axis=1)
    assert (np.diff(peaks) >= 0).all()
    assert fb.sum() > 0


def test_stft_matches_numpy_reference():
    rng = np.random.default_rng(0)
    audio = rng.standard_normal(5000).astype(np.float32)
    got = np.asarray(stft_magnitude(audio, fft_size=1024, hop_size=256))
    want = _np_stft_mag(audio, 1024, 256)
    assert got.shape == want.shape == (num_frames(5000, 256), 513)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)


def test_logmel_matches_numpy_reference():
    rng = np.random.default_rng(1)
    sr = 16000
    audio = (0.5 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)).astype(np.float32)
    audio += 0.01 * rng.standard_normal(sr).astype(np.float32)
    got = logmelfilterbank(audio, sr, fft_size=1024, hop_size=256, num_mels=80)
    spc = _np_stft_mag(audio, 1024, 256)
    fb = mel_filterbank(sr, 1024, 80, 0, sr / 2).astype(np.float64)
    want = np.log10(np.maximum(1e-10, spc @ fb.T))
    assert got.shape == want.shape
    # linear-domain mel energies must agree tightly
    np.testing.assert_allclose(10.0 ** got, 10.0 ** want, rtol=5e-3, atol=1e-9)
    # log-domain agreement away from the eps floor (float32 rounding blows up
    # log differences for bins sitting at ~1e-10)
    mask = want > -8.0
    assert mask.mean() > 0.5
    np.testing.assert_allclose(got[mask], want[mask], atol=2e-2)


def test_logmel_extractor_bucketing_consistent():
    """Bucketed padding must not change the valid frames."""
    rng = np.random.default_rng(2)
    ex = LogMelExtractor(16000, bucket_samples=4096)
    audio = rng.standard_normal(10000).astype(np.float32)
    a = ex(audio)
    b = ex(np.pad(audio, (0, 0)))  # same audio, second call hits cache
    assert a.shape[0] == num_frames(10000, 256)
    np.testing.assert_allclose(a, b)


def test_running_stats_matches_sklearn_semantics():
    rng = np.random.default_rng(3)
    xs = [rng.standard_normal((n, 5)) for n in (7, 13, 100)]
    rs = RunningStats()
    for x in xs:
        rs.update(x)
    allx = np.concatenate(xs)
    np.testing.assert_allclose(rs.mean, allx.mean(axis=0), atol=1e-10)
    np.testing.assert_allclose(rs.scale, allx.std(axis=0), atol=1e-10)


def test_running_stats_merge():
    rng = np.random.default_rng(4)
    a, b = rng.standard_normal((50, 3)), rng.standard_normal((70, 3))
    r1 = RunningStats().update(a)
    r2 = RunningStats().update(b)
    r1.merge(r2)
    allx = np.concatenate([a, b])
    np.testing.assert_allclose(r1.mean, allx.mean(axis=0), atol=1e-10)
    np.testing.assert_allclose(r1.scale, allx.std(axis=0), atol=1e-10)


def test_normalize_roundtrip():
    rng = np.random.default_rng(5)
    x = rng.standard_normal((20, 4)) * 3 + 1
    mean, scale = x.mean(0), x.std(0)
    z = normalize(x, mean, scale)
    np.testing.assert_allclose(z.mean(0), 0, atol=1e-10)
    np.testing.assert_allclose(denormalize(z, mean, scale), x, atol=1e-10)


def test_hann_window_periodic():
    w = hann_window(8)
    # periodic hann: w[0] == 0, symmetric around N/2
    assert w[0] == pytest.approx(0.0)
    assert w[4] == pytest.approx(1.0)
    np.testing.assert_allclose(w[1:4], w[-1:-4:-1], atol=1e-7)

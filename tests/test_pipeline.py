"""Single-jit wav->wav pipeline test."""

import jax
import numpy as np

from seq2seq_vc_tpu.models import AASVC
from seq2seq_vc_tpu.pipeline import Wav2WavConverter
from seq2seq_vc_tpu.vocoder.hifigan import HifiganGenerator


def test_wav2wav_pipeline_roundtrip():
    sr = 16000
    model = AASVC(
        idim=80, odim=80, adim=32, aheads=2, elayers=1, eunits=64,
        dlayers=1, dunits=64, postnet_layers=0,
        post_encoder_reduction_factor=2,
        duration_predictor_type="stochastic",
        stochastic_duration_predictor_flows=2,
        conformer_enc_kernel_size=7, conformer_dec_kernel_size=7,
    )
    voc = HifiganGenerator(
        in_channels=80, upsample_channels=32,
        upsample_kernel_sizes=(16, 16, 4, 4), upsample_factors=(8, 8, 2, 2),
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
    )
    rng = np.random.default_rng(0)
    dummy_mel = rng.standard_normal((1, 32, 80)).astype(np.float32)
    lens = np.asarray([32], np.int32)
    keys = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
            "noise": jax.random.PRNGKey(2)}
    mp = jax.jit(
        lambda m, l: model.init(keys, m, l, m, l, m, l, deterministic=True)
    )(dummy_mel, lens)
    vp = jax.jit(lambda m: voc.init(jax.random.PRNGKey(3), m))(dummy_mel)

    stats = {"mean": np.zeros(80, np.float32), "scale": np.ones(80, np.float32)}
    config = {"sampling_rate": sr, "fft_size": 1024, "hop_size": 256,
              "num_mels": 80, "fmin": 80, "fmax": 7600}
    conv = Wav2WavConverter(model, mp, voc, vp, stats, stats, config,
                            bucket_frames=32)

    t = np.arange(sr) / sr
    audio = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    y = conv(audio)
    assert y.ndim == 1 and len(y) > 0
    assert len(y) % 256 == 0
    assert np.isfinite(y).all()
    # jit cache reuse for same bucket
    y2 = conv(audio * 0.9, rng=jax.random.PRNGKey(7))
    # one convert jit + one synth jit (keyed by out-length bucket)
    assert len(conv._jit_cache) == 2
    assert np.isfinite(y2).all()


def test_wav2wav_pipeline_decoder_reduction_factor():
    """Output sample count must be out_frames * hop, with no double
    application of decoder_reduction_factor (regression: pipeline used to
    multiply AASVC.inference's already-expanded out_lens by dr again)."""
    sr = 16000
    model = AASVC(
        idim=80, odim=80, adim=32, aheads=2, elayers=1, eunits=64,
        dlayers=1, dunits=64, postnet_layers=0,
        post_encoder_reduction_factor=2, decoder_reduction_factor=2,
        duration_predictor_type="deterministic",
        conformer_enc_kernel_size=7, conformer_dec_kernel_size=7,
    )
    voc = HifiganGenerator(
        in_channels=80, upsample_channels=32,
        upsample_kernel_sizes=(16, 16, 4, 4), upsample_factors=(8, 8, 2, 2),
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
    )
    rng = np.random.default_rng(0)
    dummy_mel = rng.standard_normal((1, 32, 80)).astype(np.float32)
    lens = np.asarray([32], np.int32)
    keys = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
            "noise": jax.random.PRNGKey(2)}
    mp = jax.jit(
        lambda m, l: model.init(keys, m, l, m, l, m, l, deterministic=True)
    )(dummy_mel, lens)
    vp = jax.jit(lambda m: voc.init(jax.random.PRNGKey(3), m))(dummy_mel)

    stats = {"mean": np.zeros(80, np.float32), "scale": np.ones(80, np.float32)}
    config = {"sampling_rate": sr, "fft_size": 1024, "hop_size": 256,
              "num_mels": 80, "fmin": 80, "fmax": 7600}
    conv = Wav2WavConverter(model, mp, voc, vp, stats, stats, config,
                            bucket_frames=32)

    t = np.arange(sr // 2) / sr
    audio = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    y = conv(audio)
    # out_lens from the model is in full decoder frames already
    assert conv.last_out_frames % 2 == 0  # multiple of dr by construction
    assert len(y) == conv.last_out_frames * 256
    assert np.isfinite(y).all()


def test_wav2wav_convert_batch_matches_single():
    """convert_batch: one (B, T) model dispatch must reproduce per-item
    __call__ outputs exactly (deterministic duration predictor, so the
    noise rng is unused and batching is the only difference)."""
    sr = 16000
    model = AASVC(
        idim=80, odim=80, adim=32, aheads=2, elayers=1, eunits=64,
        dlayers=1, dunits=64, postnet_layers=0,
        post_encoder_reduction_factor=2,
        duration_predictor_type="deterministic",
        conformer_enc_kernel_size=7, conformer_dec_kernel_size=7,
    )
    voc = HifiganGenerator(
        in_channels=80, upsample_channels=32,
        upsample_kernel_sizes=(16, 16, 4, 4), upsample_factors=(8, 8, 2, 2),
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
    )
    rng = np.random.default_rng(5)
    dummy_mel = rng.standard_normal((1, 32, 80)).astype(np.float32)
    lens = np.asarray([32], np.int32)
    keys = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
            "noise": jax.random.PRNGKey(2)}
    mp = jax.jit(
        lambda m, l: model.init(keys, m, l, m, l, m, l, deterministic=True)
    )(dummy_mel, lens)
    vp = jax.jit(lambda m: voc.init(jax.random.PRNGKey(3), m))(dummy_mel)
    stats = {"mean": np.zeros(80, np.float32), "scale": np.ones(80, np.float32)}
    config = {"sampling_rate": sr, "fft_size": 1024, "hop_size": 256,
              "num_mels": 80, "fmin": 80, "fmax": 7600}
    conv = Wav2WavConverter(model, mp, voc, vp, stats, stats, config,
                            bucket_frames=32)

    t = np.arange(sr) / sr
    audios = [
        (0.3 * np.sin(2 * np.pi * f * t[: n])).astype(np.float32)
        for f, n in [(220, sr // 2), (330, sr // 3), (440, int(sr * 0.45))]
    ]
    batched = conv.convert_batch(audios)
    assert len(batched) == 3
    for a, got in zip(audios, batched):
        # single-item __call__ pads to ITS OWN bucket; items whose own
        # bucket equals the batch bucket must match exactly. The first
        # (longest) item always does.
        single = conv(a)
        if len(single) == len(got):
            np.testing.assert_allclose(got, single, rtol=1e-5, atol=1e-5)
    # the longest item defines the batch bucket -> exact match required
    single0 = conv(audios[0])
    np.testing.assert_array_equal(batched[0].shape, single0.shape)
    np.testing.assert_allclose(batched[0], single0, rtol=1e-5, atol=1e-5)


def test_wav2wav_ar_converter_roundtrip_and_batch():
    """AR (VTN) wav->wav converter: analysis jit -> ChunkedARDecoder ->
    chunked HiFi-GAN, single and batched; output is hop-aligned audio of
    out_lens frames."""
    from seq2seq_vc_tpu.models import VTN
    from seq2seq_vc_tpu.pipeline import Wav2WavARConverter

    sr = 16000
    model = VTN(
        idim=80, odim=80, adim=32, aheads=2, elayers=1, eunits=64,
        dlayers=1, dunits=64, postnet_layers=2, postnet_chans=16,
        dprenet_units=16, decoder_reduction_factor=2,
    )
    voc = HifiganGenerator(
        in_channels=80, upsample_channels=32,
        upsample_kernel_sizes=(16, 16, 4, 4), upsample_factors=(8, 8, 2, 2),
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
    )
    rng = np.random.default_rng(0)
    dummy_mel = rng.standard_normal((1, 32, 80)).astype(np.float32)
    lens = np.asarray([32], np.int32)
    labels = np.zeros((1, 32), np.float32)
    keys = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    mp = jax.jit(
        lambda m, l, lab: model.init(keys, m, l, m, lab, l, deterministic=True)
    )(dummy_mel, lens, labels)
    vp = jax.jit(lambda m: voc.init(jax.random.PRNGKey(3), m))(dummy_mel)

    stats = {"mean": np.zeros(80, np.float32), "scale": np.ones(80, np.float32)}
    config = {
        "sampling_rate": sr, "fft_size": 1024, "hop_size": 256,
        "num_mels": 80, "fmin": 80, "fmax": 7600,
        "model_params": {"decoder_reduction_factor": 2},
        # low threshold: the random-init model stops early, exercising the
        # early-exit path; small chunks keep the CPU test fast
        "inference": {"threshold": 0.3, "maxlenratio": 3.0,
                      "decode_chunk_steps": 8, "decode_max_chunk_steps": 32},
    }
    conv = Wav2WavARConverter(model, mp, voc, vp, stats, stats, config,
                              bucket_frames=32)

    t = np.arange(sr // 2) / sr
    audio = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    y = conv(audio)
    assert y.ndim == 1 and len(y) > 0 and len(y) % 256 == 0
    assert np.isfinite(y).all()

    ys = conv.convert_batch([audio, audio[: sr // 4]],
                            rng=jax.random.PRNGKey(5))
    assert len(ys) == 2
    for w in ys:
        assert w.ndim == 1 and len(w) > 0 and np.isfinite(w).all()


def test_wav2wav_converter_hosts_fastspeech_vc():
    """The NAR converter is model-agnostic: FastSpeechVC rides the same
    single-jit pipeline (duration predictor -> length regulate -> decode)."""
    from seq2seq_vc_tpu.models import FastSpeechVC

    sr = 16000
    model = FastSpeechVC(
        idim=80, odim=80, adim=32, aheads=2, elayers=1, eunits=64,
        dlayers=1, dunits=64, postnet_layers=2, postnet_chans=16,
        encoder_type="conformer", decoder_type="conformer",
        encoder_input_layer="linear", positionwise_layer_type="linear",
        conformer_enc_kernel_size=7, conformer_dec_kernel_size=7,
        teacher_model_decoder_reduction_factor=2,
    )
    voc = HifiganGenerator(
        in_channels=80, upsample_channels=32,
        upsample_kernel_sizes=(16, 16, 4, 4), upsample_factors=(8, 8, 2, 2),
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
    )
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((1, 16, 80)).astype(np.float32)
    lens = np.asarray([16], np.int32)
    ds = np.ones((1, 16), np.int32)
    keys = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    mp = jax.jit(
        lambda m, l, d: model.init(keys, m, l, m, l, d, deterministic=True)
    )(mel, lens, ds)
    vp = jax.jit(lambda m: voc.init(jax.random.PRNGKey(3), m))(mel)

    stats = {"mean": np.zeros(80, np.float32), "scale": np.ones(80, np.float32)}
    config = {"sampling_rate": sr, "fft_size": 1024, "hop_size": 256,
              "num_mels": 80, "fmin": 80, "fmax": 7600}
    conv = Wav2WavConverter(model, mp, voc, vp, stats, stats, config,
                            bucket_frames=32)
    audio = (0.3 * np.sin(2 * np.pi * 220 * np.arange(sr // 2) / sr)).astype(
        np.float32
    )
    y = conv(audio)
    assert y.ndim == 1 and len(y) > 0 and np.isfinite(y).all()


def test_wav2wav_ar_streamed_matches_serial():
    """stream_vocoder=True (speculative postnet+synthesis during decode)
    produces the same waveforms as the serial path: the matching
    speculation IS the final math. Comparison excludes each item's final
    halo receptive field, where the serial per-item bucket trim sees edge
    padding but the streamed full-length batch sees real frames."""
    from seq2seq_vc_tpu.models import VTN
    from seq2seq_vc_tpu.pipeline import Wav2WavARConverter
    from seq2seq_vc_tpu.vocoder.hifigan import HifiganGenerator

    sr = 16000
    model = VTN(
        idim=80, odim=80, adim=32, aheads=2, elayers=1, eunits=64,
        dlayers=1, dunits=64, postnet_layers=2, postnet_chans=16,
        dprenet_units=16, decoder_reduction_factor=2,
    )
    voc = HifiganGenerator(
        in_channels=80, upsample_channels=32,
        upsample_kernel_sizes=(16, 16, 4, 4), upsample_factors=(8, 8, 2, 2),
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
    )
    rng = np.random.default_rng(1)
    dummy_mel = rng.standard_normal((1, 32, 80)).astype(np.float32)
    lens = np.asarray([32], np.int32)
    labels = np.zeros((1, 32), np.float32)
    keys = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    mp = jax.jit(
        lambda m, l, lab: model.init(keys, m, l, m, lab, l, deterministic=True)
    )(dummy_mel, lens, labels)
    vp = jax.jit(lambda m: voc.init(jax.random.PRNGKey(3), m))(dummy_mel)

    stats = {"mean": np.zeros(80, np.float32), "scale": np.ones(80, np.float32)}
    config = {
        "sampling_rate": sr, "fft_size": 1024, "hop_size": 256,
        "num_mels": 80, "fmin": 80, "fmax": 7600,
        "model_params": {"decoder_reduction_factor": 2},
        "inference": {"threshold": 0.3, "maxlenratio": 3.0,
                      "decode_chunk_steps": 8, "decode_max_chunk_steps": 32},
    }
    conv = Wav2WavARConverter(model, mp, voc, vp, stats, stats, config,
                              bucket_frames=32)

    t = np.arange(sr // 2) / sr
    audio = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    audios = [audio, audio[: sr // 4]]
    key = jax.random.PRNGKey(7)
    ys_serial = conv.convert_batch(audios, rng=key, stream_vocoder=False)
    ys_stream = conv.convert_batch(audios, rng=key, stream_vocoder=True)
    assert len(ys_serial) == len(ys_stream) == 2
    hop, halo = 256, 8
    for ws, wt in zip(ys_serial, ys_stream):
        assert len(ws) == len(wt)
        n_safe = max(0, len(ws) - (halo + 1) * hop)
        np.testing.assert_allclose(wt[:n_safe], ws[:n_safe], atol=2e-4)

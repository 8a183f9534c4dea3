"""vc_serve service layer: request handling + vocoder checkpoint layouts.

The full server was driven end-to-end on the real chip (stdio and TCP
modes) against egs/synth/vc1 artifacts; these CPU tests pin the pieces
that don't need a device: line-protocol parsing, error containment,
resampling/stereo handling, and load_hifigan_model's acceptance of every
framework checkpoint layout.
"""

import json
import os

import flax.serialization
import jax
import numpy as np

from seq2seq_vc_tpu.bin.vc_serve import ConversionService
from seq2seq_vc_tpu.utils.audio import read_wav, write_wav
from seq2seq_vc_tpu.vocoder.hifigan import HifiganGenerator, load_hifigan_model


class _EchoConverter:
    """Stands in for Wav2WavConverter: returns the input scaled."""

    def __init__(self):
        self.calls = []

    def __call__(self, audio, rng=None):
        self.calls.append((len(audio), rng))
        return 0.5 * audio


def test_handle_line_roundtrip_and_errors(tmp_path):
    sr = 16000
    conv = _EchoConverter()
    svc = ConversionService(conv, sr)

    wav_in = os.path.join(tmp_path, "in.wav")
    wav_out = os.path.join(tmp_path, "out.wav")
    t = np.arange(sr) / sr
    write_wav(wav_in, (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32), sr)

    res = json.loads(svc.handle_line(f"{wav_in} {wav_out}"))
    assert res["ok"] and res["out"] == wav_out
    assert abs(res["input_seconds"] - 1.0) < 1e-3
    y, sr_out = read_wav(wav_out)
    assert sr_out == sr and len(y) == sr
    # per-request distinct rng
    res2 = json.loads(svc.handle_line(f"{wav_in} {wav_out}"))
    assert res2["ok"]
    assert not np.array_equal(
        np.asarray(conv.calls[0][1]), np.asarray(conv.calls[1][1])
    )

    bad = json.loads(svc.handle_line("only-one-field"))
    assert not bad["ok"] and "expected" in bad["error"]
    missing = json.loads(svc.handle_line(f"{tmp_path}/nope.wav {wav_out}"))
    assert not missing["ok"]  # error surfaced as JSON, no exception


def test_convert_file_resamples_to_model_rate(tmp_path):
    svc = ConversionService(_EchoConverter(), 16000)
    wav_in = os.path.join(tmp_path, "in8k.wav")
    wav_out = os.path.join(tmp_path, "out.wav")
    write_wav(wav_in, np.zeros(8000, np.float32), 8000)  # 1 s @ 8 kHz
    res = svc.convert_file(wav_in, wav_out)
    assert abs(res["input_seconds"] - 1.0) < 1e-3
    _, sr_out = read_wav(wav_out)
    assert sr_out == 16000


class _BatchEchoConverter(_EchoConverter):
    """Echo converter that also records batched dispatches."""

    def __init__(self, delay=0.0):
        super().__init__()
        self.batch_calls = []
        self.delay = delay

    def convert_batch(self, audios, rng=None):
        import time as _t

        if self.delay:
            _t.sleep(self.delay)
        self.batch_calls.append([len(a) for a in audios])
        return [0.5 * a for a in audios]


def test_micro_batching_coalesces_concurrent_requests(tmp_path):
    import threading

    sr = 16000
    conv = _BatchEchoConverter()
    svc = ConversionService(conv, sr, max_batch=4, batch_window_ms=500.0)

    wavs = []
    for i, n in enumerate([sr, sr // 2, sr // 4]):
        p = os.path.join(tmp_path, f"in{i}.wav")
        write_wav(p, np.full(n, 0.1 * (i + 1), np.float32), sr)
        wavs.append((p, os.path.join(tmp_path, f"out{i}.wav"), n))

    results = {}

    def worker(i, in_p, out_p):
        results[i] = svc.convert_file(in_p, out_p)

    threads = [
        threading.Thread(target=worker, args=(i, ip, op))
        for i, (ip, op, _) in enumerate(wavs)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    assert all(results[i]["ok"] for i in range(3))
    # 3 requests within the window -> ONE batched dispatch, padded to the
    # next power of two (4) by repeating item 0
    assert len(conv.batch_calls) == 1 and len(conv.calls) == 0
    assert len(conv.batch_calls[0]) == 4
    assert sorted(conv.batch_calls[0][:3]) == sorted(n for _, _, n in wavs)
    for i, (_, out_p, n) in enumerate(wavs):
        assert results[i]["batch"] == 3
        y, _ = read_wav(out_p)
        np.testing.assert_allclose(
            y, np.full(n, 0.05 * (i + 1), np.float32), atol=2e-4
        )


def test_micro_batching_single_request_uses_unbatched_path(tmp_path):
    sr = 16000
    conv = _BatchEchoConverter()
    svc = ConversionService(conv, sr, max_batch=4, batch_window_ms=1.0)
    p = os.path.join(tmp_path, "in.wav")
    write_wav(p, np.zeros(sr, np.float32), sr)
    res = svc.convert_file(p, os.path.join(tmp_path, "out.wav"))
    assert res["ok"] and res["batch"] == 1
    assert len(conv.calls) == 1 and len(conv.batch_calls) == 0


def test_micro_batching_delivers_errors_to_all_waiters():
    class _Boom(_BatchEchoConverter):
        def convert_batch(self, audios, rng=None):
            raise RuntimeError("boom")

        def __call__(self, audio, rng=None):
            raise RuntimeError("boom")

    svc = ConversionService(_Boom(), 16000, max_batch=2, batch_window_ms=1.0)
    res = json.loads(svc.handle_line("a.wav b.wav"))
    assert not res["ok"]  # read_wav fails first, but serving continues
    try:
        svc._run(np.zeros(16000, np.float32))
        raised = False
    except RuntimeError as e:
        raised = "boom" in str(e)
    assert raised


def test_tcp_idle_watchdog_exits_and_drains(tmp_path):
    """A forgotten TCP daemon must release the accelerator on its own:
    --max-idle-seconds shuts the server down after inactivity (and the
    drain path — waiting on the device lock — runs without deadlock)."""
    import threading

    from seq2seq_vc_tpu.bin.vc_serve import serve_tcp

    sr = 16000
    svc = ConversionService(_EchoConverter(), sr)
    ready = {}

    def _serve():
        # port 0 = ephemeral
        serve_tcp(svc, "127.0.0.1", 0, max_idle_seconds=0.5)
        ready["done"] = True

    t = threading.Thread(target=_serve, daemon=True)
    t.start()
    t.join(timeout=20.0)
    assert ready.get("done"), "idle watchdog did not shut the server down"


def test_idle_watchdog_spares_inflight_requests():
    """A request that outlives --max-idle-seconds (e.g. a minutes-long
    first-bucket compile over the remote tunnel) must NOT count as idleness:
    last_activity is stamped at request start, so without the busy() guard
    the watchdog killed the server mid-request (observed in the
    bench_serve_load smoke run: a 182 s first micro-batch compile vs a 45 s
    idle bound -> connection refused for every later client)."""
    import threading
    import time as _time

    class _SlowConverter:
        def __call__(self, audio, rng=None):
            _time.sleep(1.2)
            return audio

    svc = ConversionService(_SlowConverter(), 16000)
    done = {}

    def _req():
        done["out"] = svc._run(np.zeros(16, np.float32))

    t = threading.Thread(target=_req, daemon=True)
    t.start()
    _time.sleep(0.2)
    # mid-request: the service must report busy and never look idle enough
    # for a 0.5 s watchdog to fire
    assert svc.busy()
    t.join(timeout=10.0)
    assert done["out"][1] == 1
    assert not svc.busy()
    # after completion, idleness is measured from the request END
    assert _time.time() - svc.last_activity < 1.0


def _tiny_voc():
    gen_cfg = dict(
        in_channels=8, upsample_channels=8,
        upsample_kernel_sizes=(4, 4), upsample_factors=(2, 2),
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1,),),
    )
    voc = HifiganGenerator(**gen_cfg)
    params = voc.init(jax.random.PRNGKey(0), np.zeros((1, 8, 8), np.float32))
    return gen_cfg, jax.tree_util.tree_map(np.asarray, params)


def test_load_hifigan_model_layouts(tmp_path):
    import yaml

    gen_cfg, params = _tiny_voc()
    cfg_path = os.path.join(tmp_path, "voc.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(
            {"generator_params": {
                k: (list(v) if isinstance(v, tuple) else v)
                for k, v in gen_cfg.items()
            }},
            f,
        )

    layouts = {
        "plain": params,
        "model": {"model": params},
        # GAN-trainer bundles store {"generator": <tree>, "discriminator": ...}
        "gan": {"model": {"generator": params, "discriminator": {}}},
    }

    x = np.zeros((1, 8, 8), np.float32)
    ref_model = HifiganGenerator(**gen_cfg)
    want = np.asarray(ref_model.apply(params, x))
    for name, state in layouts.items():
        path = os.path.join(tmp_path, f"{name}.ckpt")
        with open(path, "wb") as f:
            f.write(flax.serialization.msgpack_serialize(state))
        model, restored = load_hifigan_model(path, cfg_path)
        got = np.asarray(model.apply(restored, x))
        np.testing.assert_array_equal(got, want, err_msg=name)


def test_build_converter_vtn_ar_path(tmp_path):
    """vc_serve hosts AR (VTN) checkpoints: build_converter dispatches to
    Wav2WavARConverter and a conversion runs end to end from files."""
    import argparse

    import jax.numpy as jnp
    import yaml

    from seq2seq_vc_tpu.bin.vc_serve import build_converter
    from seq2seq_vc_tpu.core.checkpoint import save_checkpoint
    from seq2seq_vc_tpu.models import VTN
    from seq2seq_vc_tpu.pipeline import Wav2WavARConverter
    from seq2seq_vc_tpu.utils.io import write_hdf5

    d = 8  # matches the tiny vocoder's in_channels
    model_params = dict(
        idim=d, odim=d, adim=16, aheads=2, elayers=1, eunits=32,
        dlayers=1, dunits=32, postnet_layers=2, postnet_chans=8,
        dprenet_units=8, decoder_reduction_factor=2,
    )
    config = {
        "sampling_rate": 16000, "fft_size": 256, "hop_size": 128,
        "num_mels": d, "fmin": 80, "fmax": 7600,
        "model_type": "VTN", "model_params": model_params,
        "inference": {"threshold": 0.3, "maxlenratio": 2.0,
                      "decode_chunk_steps": 8, "decode_max_chunk_steps": 16},
    }
    exp = tmp_path / "exp"
    exp.mkdir()
    with open(exp / "config.yml", "w") as f:
        yaml.safe_dump(config, f)

    model = VTN(**model_params)
    keys = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    mp = model.init(
        keys, np.zeros((1, 16, d), np.float32), np.asarray([16]),
        np.zeros((1, 16, d), np.float32), np.zeros((1, 16), np.float32),
        np.asarray([16]), deterministic=True,
    )
    ckpt = str(exp / "checkpoint-1steps.ckpt")
    save_checkpoint(ckpt, mp, {}, 1, 1)

    stats_path = str(tmp_path / "stats.h5")
    write_hdf5(stats_path, "mel_mean", np.zeros(d, np.float32))
    write_hdf5(stats_path, "mel_scale", np.ones(d, np.float32))

    gen_cfg, vparams = _tiny_voc()
    voc_ckpt = str(tmp_path / "voc.ckpt")
    with open(voc_ckpt, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(vparams))
    voc_cfg = str(tmp_path / "voc.yml")
    import yaml as _yaml

    with open(voc_cfg, "w") as f:
        _yaml.safe_dump(
            {"generator_params": {
                k: (list(v) if isinstance(v, tuple) else v)
                for k, v in gen_cfg.items()
            }},
            f,
        )

    args = argparse.Namespace(
        checkpoint=ckpt, config=None, src_stats=stats_path,
        trg_stats=stats_path, vocoder_checkpoint=voc_ckpt,
        vocoder_config=voc_cfg, vocoder_stats=None, feat_type="mel",
        bucket_frames=32,
    )
    conv = build_converter(args)
    assert isinstance(conv, Wav2WavARConverter)
    audio = (0.1 * np.random.default_rng(7).standard_normal(4000)).astype(
        np.float32
    )
    y = conv(audio)
    assert y.ndim == 1 and len(y) > 0 and np.isfinite(y).all()

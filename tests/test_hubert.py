"""Native HuBERT(-soft) vs torch: converter parity against a randomly
initialized transformers.HubertModel (no network needed), plus the soft
head's logits semantics."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from seq2seq_vc_tpu.urhythmic.hubert import (  # noqa: E402
    HubertSoft,
    convert_torch_hubert,
)


@pytest.fixture(scope="module")
def hf_pair():
    from transformers import HubertConfig, HubertModel

    cfg = HubertConfig()  # defaults == facebook/hubert-base-ls960
    torch.manual_seed(0)
    tm = HubertModel(cfg).eval()
    params = convert_torch_hubert(tm.state_dict())
    return tm, params


def test_encoder_matches_transformers(hf_pair):
    tm, params = hf_pair
    rng = np.random.default_rng(0)
    wav = (0.1 * rng.standard_normal((1, 4000))).astype(np.float32)

    with torch.inference_mode():
        want = tm(torch.from_numpy(wav)).last_hidden_state.numpy()

    model = HubertSoft()
    got = np.asarray(
        model.apply(params, np.asarray(wav), method=HubertSoft.encode)
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_masked_bucket_padding_matches_exact_length(hf_pair):
    """Tail-padded forward with ``lengths`` reproduces the exact-length
    forward on the valid frame prefix (masked instance-norm stats, zeroed
    padding before the pos-conv, key-masked attention). This is what lets
    corpus extraction bucket-pad instead of recompiling per utterance
    length — and what the UNMASKED padded forward gets wrong (padded keys
    shift every frame's softmax)."""
    tm, params = hf_pair
    from seq2seq_vc_tpu.urhythmic.hubert import conv_stack_frames

    rng = np.random.default_rng(4)
    n = 4000
    wav = (0.1 * rng.standard_normal((1, n))).astype(np.float32)
    model = HubertSoft()
    exact = np.asarray(
        model.apply(params, wav, method=HubertSoft.encode)
    )[0]
    nf = int(conv_stack_frames(n))
    assert exact.shape[0] == nf

    padded = np.pad(wav, ((0, 0), (0, 6400 - n)))
    masked = np.asarray(
        model.apply(
            params, padded, lengths=np.asarray([n], np.int32),
            method=HubertSoft.encode,
        )
    )[0][:nf]
    np.testing.assert_allclose(masked, exact, atol=2e-5, rtol=1e-4)

    # the unmasked padded forward does NOT reproduce the exact features
    unmasked = np.asarray(
        model.apply(params, padded, method=HubertSoft.encode)
    )[0][:nf]
    assert np.abs(unmasked - exact).max() > 1e-3

    # units path: same property through the (40, 40) internal padding
    exact_u = np.asarray(
        model.apply(params, wav, method=HubertSoft.units)
    )[0]
    masked_u = np.asarray(
        model.apply(
            params, padded, lengths=np.asarray([n], np.int32),
            method=HubertSoft.units,
        )
    )[0][: exact_u.shape[0]]
    np.testing.assert_allclose(masked_u, exact_u, atol=2e-5, rtol=1e-4)


def test_encode_batch_buckets_and_trims(hf_pair):
    from seq2seq_vc_tpu.urhythmic.hubert import encode_batch

    _, params = hf_pair
    model = HubertSoft()
    rng = np.random.default_rng(5)
    wav = (0.1 * rng.standard_normal(4000)).astype(np.float32)
    units, log_probs, n_frames = encode_batch(
        model, params, wav, bucket_samples=6400
    )
    exact_u = np.asarray(model.apply(params, wav[None], method=HubertSoft.units))[0]
    n = int(n_frames[0])
    assert n == exact_u.shape[0]
    np.testing.assert_allclose(
        np.asarray(units[0, :n]), exact_u, atol=2e-5, rtol=1e-4
    )


def test_urhythmic_encode_cli_batched(hf_pair, tmp_path, monkeypatch):
    """urhythmic encode CLI: batched lengths-masked dispatches write the
    same per-utterance artifacts as exact-length encoding."""
    import sys

    from seq2seq_vc_tpu.urhythmic.cli import main
    from seq2seq_vc_tpu.utils.audio import write_wav

    tm, params = hf_pair
    ckpt = tmp_path / "hubert.pt"
    torch.save(tm.state_dict(), ckpt)

    rng = np.random.default_rng(6)
    in_dir = tmp_path / "wavs"
    in_dir.mkdir()
    lens = [4000, 4480, 21000]  # two share a 1 s bucket; one is longer
    for i, n in enumerate(lens):
        write_wav(str(in_dir / f"u{i}.wav"),
                  (0.1 * rng.standard_normal(n)).astype(np.float32), 16000)

    out_dir = tmp_path / "enc"
    monkeypatch.setattr(sys, "argv", [
        "urhythmic", "encode", "--in-dir", str(in_dir),
        "--out-dir", str(out_dir), "--hubert-checkpoint", str(ckpt),
        "--batch-size", "2",
    ])
    main()

    model = HubertSoft()
    for i, n in enumerate(lens):
        units = np.load(out_dir / "soft" / f"u{i}.npy")
        lp = np.load(out_dir / "logprobs" / f"u{i}.npy")
        import jax.numpy as jnp

        from seq2seq_vc_tpu.utils.audio import read_wav

        wav, _ = read_wav(str(in_dir / f"u{i}.wav"))
        exact_u, exact_lp = model.apply(params, wav[None].astype(np.float32))
        assert units.shape == np.asarray(exact_u[0]).shape, i
        np.testing.assert_allclose(
            units, np.asarray(exact_u[0]), atol=5e-4, rtol=1e-3
        )
        np.testing.assert_allclose(
            lp, np.asarray(exact_lp[0]), atol=5e-3, rtol=1e-2
        )


def test_units_and_logits_shapes(hf_pair):
    _, params = hf_pair
    # give the zero-init soft head real values
    rng = np.random.default_rng(1)
    params["params"]["proj"]["kernel"] = rng.standard_normal((768, 256)).astype(np.float32) * 0.02
    params["params"]["label_embedding"] = rng.standard_normal((100, 256)).astype(np.float32)

    model = HubertSoft()
    wav = (0.1 * rng.standard_normal((1, 16000))).astype(np.float32)
    units, log_probs = model.apply(params, np.asarray(wav))
    # 1 s of 16 kHz audio + (400-320)//2*2 pad -> 50 frames at 20 ms hop
    assert units.shape == (1, 50, 256)
    assert log_probs.shape == (1, 50, 100)
    np.testing.assert_allclose(
        np.exp(np.asarray(log_probs)).sum(-1), 1.0, atol=1e-4
    )
    # logits are scaled cosine similarities: |logit| <= 1/temp
    model_logits = model.apply(params, units, method=HubertSoft.logits)
    assert float(np.abs(np.asarray(model_logits)).max()) <= 10.0 + 1e-4


def test_load_checkpoint_and_encode(hf_pair, tmp_path):
    """End-to-end: torch checkpoint file -> native flax encoder -> the
    urhythmic encode() entry used by the CLI."""
    tm, _ = hf_pair
    sd = dict(tm.state_dict())
    rng = np.random.default_rng(2)
    sd["proj.weight"] = torch.from_numpy(
        (rng.standard_normal((256, 768)) * 0.02).astype(np.float32)
    )
    sd["proj.bias"] = torch.zeros(256)
    sd["label_embedding.weight"] = torch.from_numpy(
        rng.standard_normal((100, 256)).astype(np.float32)
    )
    path = str(tmp_path / "hubert_soft.pt")
    torch.save(sd, path)

    from seq2seq_vc_tpu.urhythmic.hubert import load_hubert_soft
    from seq2seq_vc_tpu.urhythmic.model import encode

    pair = load_hubert_soft(path)
    wav = (0.1 * rng.standard_normal(8000)).astype(np.float32)
    units, log_probs = encode(pair, wav)
    assert units.shape == (25, 256)
    assert log_probs.shape == (25, 100)
    assert np.isfinite(units).all() and np.isfinite(log_probs).all()


def test_layer_tap_matches_transformers(hf_pair):
    """encode(output_layer=k) equals the k-th hidden state of the torch
    model (the PPG-style feature used by preprocess feat_type 'hubert')."""
    tm, params = hf_pair
    rng = np.random.default_rng(3)
    wav = (0.1 * rng.standard_normal((1, 4000))).astype(np.float32)
    with torch.inference_mode():
        hs = tm(torch.from_numpy(wav), output_hidden_states=True).hidden_states
    model = HubertSoft()
    for k in (3, 9):
        got = np.asarray(
            model.apply(params, np.asarray(wav), k, method=HubertSoft.encode)
        )
        np.testing.assert_allclose(got, hs[k].numpy(), atol=2e-4, rtol=1e-3)


def test_preprocess_hubert_feat(hf_pair, tmp_path, monkeypatch):
    """bin/preprocess extracts a layer-tapped `hubert` dataset."""
    import sys

    import h5py
    import yaml

    from seq2seq_vc_tpu.bin import preprocess as preprocess_bin
    from seq2seq_vc_tpu.utils.audio import write_wav

    tm, _ = hf_pair
    ckpt = tmp_path / "hubert_random.pt"
    torch.save(tm.state_dict(), ckpt)

    sr = 16000
    t = np.arange(sr // 2) / sr
    wav = (0.3 * np.sin(2 * np.pi * 180 * t)).astype(np.float32)
    write_wav(str(tmp_path / "utt1.wav"), wav, sr)
    (tmp_path / "wav.scp").write_text(f"utt1 {tmp_path}/utt1.wav\n")

    conf = {
        "sampling_rate": sr, "fft_size": 1024, "hop_size": 256,
        "win_length": None, "window": "hann", "num_mels": 80,
        "fmin": 80, "fmax": 7600, "global_gain_scale": 1.0,
        "trim_silence": False, "format": "hdf5",
        "feat_list": {
            "mel": {},
            "hubert": {"checkpoint": str(ckpt), "layer": 6},
        },
    }
    (tmp_path / "conf.yaml").write_text(yaml.safe_dump(conf))
    monkeypatch.setattr(
        sys, "argv",
        [
            "preprocess",
            "--wav-scp", str(tmp_path / "wav.scp"),
            "--dumpdir", str(tmp_path / "dump"),
            "--config", str(tmp_path / "conf.yaml"),
        ],
    )
    preprocess_bin.main()
    with h5py.File(tmp_path / "dump" / "utt1.h5", "r") as f:
        feat = f["hubert"][()]
    # 50 Hz, 768-d hidden features
    assert feat.shape[1] == 768
    assert abs(feat.shape[0] - 25) <= 2
    assert np.isfinite(feat).all()

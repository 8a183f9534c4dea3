"""EnCodec encoder port: numerical parity vs torch (transformers).

Instantiates a randomly-initialized ``transformers.EncodecModel`` (24 kHz
default config — no download needed), converts its encoder weights with
``convert_torch_encodec``, and compares embeddings on random audio.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from seq2seq_vc_tpu.encoders import EncodecEncoder, convert_torch_encodec  # noqa: E402
from seq2seq_vc_tpu.encoders.encodec import (  # noqa: E402
    EncodecDecoder,
    convert_torch_encodec_decoder,
)


@pytest.fixture(scope="module")
def torch_encodec():
    from transformers import EncodecConfig, EncodecModel

    torch.manual_seed(0)
    return EncodecModel(EncodecConfig()).eval()


def test_encoder_parity(torch_encodec):
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(24000) * 0.1).astype(np.float32)  # 1 s @ 24 kHz
    with torch.no_grad():
        ref = torch_encodec.encoder(torch.from_numpy(wav)[None, None])  # (1,128,T)
    ref = ref[0].T.numpy()  # (T, 128)

    model = EncodecEncoder()
    params = convert_torch_encodec(torch_encodec.state_dict())
    out = np.asarray(model.apply(params, wav[None])[0])  # (T, 128)

    assert out.shape == ref.shape == (75, 128)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_frame_rate(torch_encodec):
    # 320-sample hop: n frames == ceil(n_samples / 320)
    model = EncodecEncoder()
    params = convert_torch_encodec(torch_encodec.state_dict())
    wav = np.zeros(24000 + 173, np.float32)
    out = model.apply(params, wav[None])
    assert out.shape[1] == int(np.ceil(len(wav) / 320))


def test_decoder_parity(torch_encodec):
    """Native SEANet decoder matches the torch decoder (the reference's
    EnCodec_decoder import is broken — bin/vc_train.py:40 — so this path
    exceeds reference parity)."""
    rng = np.random.default_rng(1)
    emb = rng.standard_normal((1, 30, 128)).astype(np.float32) * 0.1
    with torch.no_grad():
        ref = torch_encodec.decoder(torch.from_numpy(emb.transpose(0, 2, 1)))
    ref = ref[0, 0].numpy()  # (n_samples,)

    model = EncodecDecoder()
    params = convert_torch_encodec_decoder(torch_encodec.state_dict())
    out = np.asarray(model.apply(params, emb)[0])

    assert out.shape == ref.shape == (30 * 320,)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_decoder_causal_tail_padding_is_exact(torch_encodec):
    """The decode path zero-pads the latent axis to a compile bucket and
    trims the waveform; the SEANet stack is causal (causal convs + forward
    LSTM), so the trimmed prefix matches to float tolerance (shape-
    dependent XLA fusion reassociates adds at ~1e-7)."""
    rng = np.random.default_rng(3)
    t = 9
    emb = rng.standard_normal((1, t, 128)).astype(np.float32) * 0.1
    model = EncodecDecoder()
    params = convert_torch_encodec_decoder(torch_encodec.state_dict())
    full = np.asarray(model.apply(params, emb)[0])
    emb_pad = np.pad(emb, ((0, 0), (0, 16 - t), (0, 0)))
    padded = np.asarray(model.apply(params, emb_pad)[0])[: t * 320]
    np.testing.assert_allclose(padded, full, atol=1e-6)


def test_encode_bucket_padding_matches_exact_length(torch_encodec):
    """encoders.encodec.encode bucket-pads the sample axis; the causal
    encoder's trimmed latent prefix matches an exact-length forward."""
    from seq2seq_vc_tpu.encoders.encodec import encode

    enc = EncodecEncoder()
    p_enc = convert_torch_encodec(torch_encodec.state_dict())
    wav = np.random.default_rng(5).standard_normal(3300).astype(np.float32) * 0.1
    got = encode(enc, p_enc, wav)  # padded + trimmed path
    ref = np.asarray(enc.apply(p_enc, wav[None]))[0]
    assert got.shape == ref.shape == (11, 128)
    # full frames are causal-exact; the final PARTIAL frame (3300 % 320
    # != 0) encodes padding in both runs and may deviate slightly
    np.testing.assert_allclose(got[:-1], ref[:-1], atol=1e-6)
    np.testing.assert_allclose(got[-1], ref[-1], atol=1e-2)


def test_encode_decode_roundtrip_shapes(torch_encodec):
    enc = EncodecEncoder()
    dec = EncodecDecoder()
    p_enc = convert_torch_encodec(torch_encodec.state_dict())
    p_dec = convert_torch_encodec_decoder(torch_encodec.state_dict())
    wav = np.random.default_rng(2).standard_normal(3200).astype(np.float32) * 0.1
    emb = enc.apply(p_enc, wav[None])
    out = dec.apply(p_dec, emb)
    assert emb.shape == (1, 10, 128)
    assert out.shape == (1, 3200)
    assert np.isfinite(np.asarray(out)).all()


def test_preprocess_encodec_cli(torch_encodec, tmp_path, monkeypatch):
    """bin/preprocess extracts an `encodec` dataset alongside mel."""
    import sys

    import h5py
    import yaml

    from seq2seq_vc_tpu.bin import preprocess as preprocess_bin
    from seq2seq_vc_tpu.utils.audio import write_wav

    ckpt = tmp_path / "encodec_random.pt"
    torch.save(torch_encodec.state_dict(), ckpt)

    sr = 16000
    t = np.arange(sr) / sr
    wav = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    write_wav(str(tmp_path / "utt1.wav"), wav, sr)
    (tmp_path / "wav.scp").write_text(f"utt1 {tmp_path}/utt1.wav\n")

    conf = {
        "sampling_rate": sr, "fft_size": 1024, "hop_size": 256,
        "win_length": None, "window": "hann", "num_mels": 80,
        "fmin": 80, "fmax": 7600, "global_gain_scale": 1.0,
        "trim_silence": False, "format": "hdf5",
        "feat_list": {"mel": {}, "encodec": {"checkpoint": str(ckpt)}},
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
        enc = f["encodec"][()]
        mel = f["mel"][()]
    assert enc.shape[1] == 128 and enc.shape[0] > 0
    assert mel.shape[1] == 80
    # 75 Hz vs 62.5 Hz frame rates over the same (hop-trimmed) audio
    assert abs(enc.shape[0] / 75.0 - mel.shape[0] / 62.5) < 0.1

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

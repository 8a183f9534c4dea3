"""Native ppg_sxliu upstream tests.

The upstream is an espnet-style conformer ASR encoder; the conversion is
proven against the LIVE reference conformer modules
(``/root/reference/seq2seq_vc/modules/conformer`` — the same espnet code
family the s3prl-vc upstream vendors), driven through a real torch
state_dict saved to disk.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from reference_runtime import load_reference

load_reference()

from seq2seq_vc_tpu.encoders.ppg import (
    Featurizer,
    infer_architecture,
    load_featurizer,
    load_ppg_upstream,
    log_mel_fbank,
)


def _reference_upstream(idim=20, adim=32, layers=2, eunits=64, kernel=7):
    """A torch module whose state_dict looks like the real upstream:
    espnet conformer encoder under the ``encoder.`` prefix."""
    from seq2seq_vc.modules.conformer.encoder import Encoder as RefConformer

    class Upstream(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = RefConformer(
                idim=idim, attention_dim=adim, attention_heads=2,
                linear_units=eunits, num_blocks=layers, input_layer="linear",
                dropout_rate=0.0, positional_dropout_rate=0.0,
                attention_dropout_rate=0.0, macaron_style=True,
                pos_enc_layer_type="rel_pos",
                selfattention_layer_type="rel_selfattn",
                use_cnn_module=True, cnn_module_kernel=kernel,
            )

        def all_states(self, feats):
            """Replicates the s3prl hidden-state stack: embed output plus
            every block output (final one after-normed)."""
            xs = self.encoder.embed(feats)
            states = [xs[0] if isinstance(xs, tuple) else xs]
            cache = xs
            for layer in self.encoder.encoders:
                cache, _ = layer(cache, None)
                states.append(cache[0] if isinstance(cache, tuple) else cache)
            states[-1] = self.encoder.after_norm(states[-1])
            return states

    return Upstream()


def test_ppg_upstream_conversion_matches_reference(tmp_path):
    torch.manual_seed(0)
    up = _reference_upstream()
    up.eval()
    g = torch.Generator().manual_seed(1)
    for m in up.modules():
        if isinstance(m, torch.nn.BatchNorm1d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.3)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)

    ckpt = tmp_path / "upstream.pkl"
    torch.save(up.state_dict(), str(ckpt))

    model, variables = load_ppg_upstream(str(ckpt))
    assert model.elayers == 2 and model.adim == 32 and model.input_dim == 20
    assert model.input_layer == "linear"

    rng = np.random.default_rng(2)
    feats = rng.standard_normal((1, 23, 20)).astype(np.float32)
    with torch.no_grad():
        ref_states = up.all_states(torch.from_numpy(feats))
    states = model.apply(variables, jnp.asarray(feats))
    assert len(states) == len(ref_states) == 3
    for i, (a, b) in enumerate(zip(ref_states, states)):
        np.testing.assert_allclose(
            np.asarray(b), a.numpy(), rtol=1e-4, atol=1e-4,
            err_msg=f"layer state {i}",
        )


def test_ppg_featurizer_and_checkpoint_loading(tmp_path):
    torch.manual_seed(3)
    # s3prl-vc downstream checkpoints carry {'featurizer': {'weights': ...}}
    w = torch.randn(3)
    torch.save({"featurizer": {"weights": w}, "model": {}}, str(tmp_path / "ds.pkl"))
    feat = load_featurizer(str(tmp_path / "ds.pkl"))
    states = [jnp.full((1, 4, 2), float(i)) for i in range(3)]
    out = np.asarray(feat(states))
    expect = (jax.nn.softmax(jnp.asarray(w.numpy())) * jnp.arange(3.0)).sum()
    np.testing.assert_allclose(out, float(expect), rtol=1e-6)

    with pytest.raises(ValueError, match="layer weights"):
        feat(states[:2])


def test_infer_architecture_reads_espnet_layout():
    up = _reference_upstream(idim=20, adim=32, layers=2, eunits=64, kernel=7)
    arch = infer_architecture({k: v for k, v in up.state_dict().items()})
    assert arch == dict(
        input_dim=20, adim=32, aheads=2, eunits=64, elayers=2,
        input_layer="linear", macaron_style=True, use_cnn_module=True,
        cnn_module_kernel=7, positionwise_layer_type="linear",
    )


def test_preprocess_cli_extracts_ppg(tmp_path, monkeypatch):
    """`feat_type: ppg_sxliu` runs end to end in bin/preprocess given the
    two checkpoint files (VERDICT r2 #5 acceptance)."""
    import sys

    import yaml

    from seq2seq_vc_tpu.bin.preprocess import main as preprocess_main
    from seq2seq_vc_tpu.utils import read_hdf5, write_wav

    torch.manual_seed(0)
    up = _reference_upstream(idim=80, adim=32, layers=2, eunits=64)
    torch.save(up.state_dict(), str(tmp_path / "upstream.pkl"))
    torch.save(
        {"featurizer": {"weights": torch.randn(3)}, "model": {}},
        str(tmp_path / "downstream.pkl"),
    )

    sr = 16000
    wav = (0.1 * np.sin(2 * np.pi * 220 * np.arange(sr // 2) / sr)).astype(
        np.float32
    )
    write_wav(str(tmp_path / "a.wav"), wav, sr)
    (tmp_path / "wav.scp").write_text(f"utt1 {tmp_path}/a.wav\n")
    conf = {
        "sampling_rate": sr, "fft_size": 1024, "hop_size": 256,
        "num_mels": 80, "fmin": 80, "fmax": 7600,
        "feat_list": {
            "mel": {},
            "ppg_sxliu": {
                "checkpoint": str(tmp_path / "downstream.pkl"),
                "upstream_checkpoint": str(tmp_path / "upstream.pkl"),
            },
        },
    }
    (tmp_path / "conf.yaml").write_text(yaml.safe_dump(conf))
    monkeypatch.setattr(
        sys, "argv",
        ["preprocess", "--wav-scp", str(tmp_path / "wav.scp"),
         "--dumpdir", str(tmp_path / "dump"),
         "--config", str(tmp_path / "conf.yaml"), "--verbose", "0"],
    )
    preprocess_main()
    feat = read_hdf5(str(tmp_path / "dump" / "utt1.h5"), "ppg_sxliu")
    # fbank at 10 ms hop, linear-input conformer: ~1 frame per hop
    assert feat.shape[1] == 32 and feat.shape[0] > 40
    assert np.isfinite(feat).all()


def test_log_mel_fbank_properties():
    sr = 16000
    t = np.arange(sr) / sr
    tone = (0.3 * np.sin(2 * np.pi * 1000.0 * t)).astype(np.float32)
    feats = np.asarray(log_mel_fbank(jnp.asarray(tone), sample_rate=sr))
    assert feats.shape == (1 + sr // 160, 80)
    # energy concentrates around the 1 kHz mel bin
    peak = feats.mean(0).argmax()
    from seq2seq_vc_tpu.dsp.mel import hz_to_mel, mel_to_hz

    centers = mel_to_hz(np.linspace(hz_to_mel(0.0), hz_to_mel(8000.0), 82))[1:-1]
    assert abs(centers[peak] - 1000.0) < 200.0
    # silence floors at log(eps)
    sil = np.asarray(log_mel_fbank(jnp.zeros(1600), sample_rate=sr))
    np.testing.assert_allclose(sil, np.log(1e-10), rtol=1e-5)

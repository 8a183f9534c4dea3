"""Taco2-AR downstream + two-stage vocoder dispatch tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from seq2seq_vc_tpu.vocoder.taco2ar import Taco2AR, convert_torch_taco2ar, linear_resample


def _tiny_model():
    return Taco2AR(
        input_dim=12, output_dim=8, resample_ratio=1.6,
        encoder_conv_layers=2, encoder_conv_chans=16, encoder_conv_filts=5,
        encoder_units=16, decoder_layers=2, decoder_units=24,
        prenet_layers=2, prenet_units=10,
    )


def test_linear_resample_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    x = rng.standard_normal((17, 3)).astype(np.float32)
    out = np.asarray(linear_resample(jnp.asarray(x), 11))
    ref = (
        F.interpolate(
            torch.from_numpy(x.T)[None], size=11, mode="linear", align_corners=False
        )[0].T.numpy()
    )
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_taco2ar_shapes_and_determinism():
    model = _tiny_model()
    rng = np.random.default_rng(0)
    latents = rng.standard_normal((2, 32, 12)).astype(np.float32)
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, latents, deterministic=True
    )
    out1 = model.apply(params, latents, rng=jax.random.PRNGKey(7), deterministic=True)
    out2 = model.apply(params, latents, rng=jax.random.PRNGKey(7), deterministic=True)
    # T' = round(32 / 1.6) = 20
    assert out1.shape == (2, 20, 8)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    # the always-on prenet dropout makes different rngs differ (AR smoother)
    out3 = model.apply(params, latents, rng=jax.random.PRNGKey(8), deterministic=True)
    assert np.abs(np.asarray(out1) - np.asarray(out3)).max() > 0


def test_taco2ar_is_jittable():
    model = _tiny_model()
    latents = np.zeros((1, 16, 12), np.float32)
    params = model.init({"params": jax.random.PRNGKey(0)}, latents, deterministic=True)
    fn = jax.jit(
        lambda p, x, k: model.apply(p, x, rng=k, deterministic=True)
    )
    out = fn(params, latents, jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(out)).all()


def _torch_replica(torch, model):
    """Live torch replica of the upstream s3prl-vc Taco2-AR architecture,
    registered in TORCH parameter order with the upstream names (encoder
    Linear embed -> conv/BN stack -> bidirectional nn.LSTM; decoder
    nn.LSTMCell stack + prenet + proj). Exercising the converter against
    this rules out the silent cross-wiring a shape-matcher allowed:
    LSTMCell registers weight_ih BEFORE weight_hh and torch's BLSTM
    registers forward before reverse, both opposite to the flax
    alphabetical flatten order."""
    nn_t = torch.nn

    class Replica(nn_t.Module):
        def __init__(self):
            super().__init__()
            enc = nn_t.Module()
            enc.embed = nn_t.Linear(model.input_dim, model.encoder_conv_chans)
            enc.convs = nn_t.ModuleList()
            for _ in range(model.encoder_conv_layers):
                enc.convs.append(
                    nn_t.Sequential(
                        nn_t.Conv1d(
                            model.encoder_conv_chans, model.encoder_conv_chans,
                            model.encoder_conv_filts,
                            padding=(model.encoder_conv_filts - 1) // 2,
                            bias=False,
                        ),
                        nn_t.BatchNorm1d(model.encoder_conv_chans),
                        nn_t.ReLU(),
                        nn_t.Dropout(0.5),
                    )
                )
            enc.blstm = nn_t.LSTM(
                model.encoder_conv_chans, model.encoder_units // 2,
                batch_first=True, bidirectional=True,
            )
            self.encoder = enc
            dec = nn_t.Module()
            dec.lstms = nn_t.ModuleList()
            for i in range(model.decoder_layers):
                d_in = (
                    model.encoder_units + model.prenet_units
                    if i == 0 else model.decoder_units
                )
                dec.lstms.append(nn_t.LSTMCell(d_in, model.decoder_units))
            pre = nn_t.Module()
            pre.prenet = nn_t.ModuleList()
            for i in range(model.prenet_layers):
                d_in = model.output_dim if i == 0 else model.prenet_units
                pre.prenet.append(
                    nn_t.Sequential(nn_t.Linear(d_in, model.prenet_units), nn_t.ReLU())
                )
            dec.prenet = pre
            dec.proj = nn_t.Linear(
                model.encoder_units + model.decoder_units, model.output_dim
            )
            self.decoder = dec

        def forward(self, latents, t_out):
            import torch.nn.functional as F

            x = F.interpolate(
                latents.transpose(1, 2), size=t_out, mode="linear",
                align_corners=False,
            ).transpose(1, 2)
            x = self.encoder.embed(x)
            x = x.transpose(1, 2)
            for conv in self.encoder.convs:
                x = conv(x)
            x = x.transpose(1, 2)
            enc, _ = self.encoder.blstm(x)
            B = enc.shape[0]
            prev = torch.zeros(B, model.output_dim)
            states = [
                (torch.zeros(B, model.decoder_units), torch.zeros(B, model.decoder_units))
                for _ in range(model.decoder_layers)
            ]
            outs = []
            for t in range(t_out):
                p = prev
                for seq in self.decoder.prenet.prenet:
                    p = seq(p)  # prenet dropout rate 0 in this parity test
                h = torch.cat([enc[:, t], p], dim=-1)
                for i, cell in enumerate(self.decoder.lstms):
                    hi, ci = cell(h, states[i])
                    states[i] = (hi, ci)
                    h = hi
                out = self.decoder.proj(torch.cat([enc[:, t], h], dim=-1))
                outs.append(out)
                prev = out
            return torch.stack(outs, dim=1)

    return Replica()


def test_convert_matches_torch_replica():
    """Converted checkpoints reproduce the torch forward numerically —
    name-based mapping covers LSTM ih/hh order, BLSTM directions, BN
    running stats, prenet and proj."""
    torch = pytest.importorskip("torch")
    model = Taco2AR(
        input_dim=12, output_dim=8, resample_ratio=1.6,
        encoder_conv_layers=2, encoder_conv_chans=16, encoder_conv_filts=5,
        encoder_units=16, decoder_layers=2, decoder_units=24,
        prenet_layers=2, prenet_units=10, prenet_dropout_rate=0.0,
        norm_type="batch_norm",
    )
    torch.manual_seed(0)
    replica = _torch_replica(torch, model)
    replica.eval()
    # randomized running stats: init-stat (0/1) BN would hide a mis-mapping
    g = torch.Generator().manual_seed(1)
    for m in replica.modules():
        if isinstance(m, torch.nn.BatchNorm1d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.3)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)

    rng = np.random.default_rng(2)
    latents = rng.standard_normal((2, 32, 12)).astype(np.float32)
    t_out = 20  # round(32 / 1.6)
    with torch.no_grad():
        ref = replica(torch.from_numpy(latents), t_out).numpy()

    variables = convert_torch_taco2ar(replica.state_dict(), model)
    out = model.apply(
        variables, jnp.asarray(latents), rng=jax.random.PRNGKey(0),
        deterministic=True,
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_convert_rejects_unknown_and_leftover_tensors():
    torch = pytest.importorskip("torch")
    model = _tiny_model()
    torch.manual_seed(0)
    replica = _torch_replica(torch, model)
    sd = {k: v for k, v in replica.state_dict().items()}

    # GroupNorm model cannot accept BN running stats
    with pytest.raises(ValueError, match="batch_norm"):
        convert_torch_taco2ar(sd, model)

    bn_model = model.clone(norm_type="batch_norm")
    extra = dict(sd)
    extra["decoder.extra.weight"] = torch.zeros(3, 3)
    with pytest.raises(ValueError, match="unconverted"):
        convert_torch_taco2ar(extra, bn_model)

    missing = dict(sd)
    missing.pop("encoder.blstm.weight_ih_l0_reverse")
    with pytest.raises(KeyError, match="weight_ih_l0_reverse"):
        convert_torch_taco2ar(missing, bn_model)


def test_feat2wav_uses_trg_stats_denorm():
    from seq2seq_vc_tpu.vocoder.s3prl_feat2wav import S3PRL_Feat2Wav

    seen = {}

    class FakeInner:
        fs = 16000

        def decode(self, mel):
            seen["mel"] = mel
            return np.zeros(1600, np.float32)

    def downstream(latents):
        seen["latents"] = latents
        return np.tile(latents.mean(axis=1, keepdims=True), (1, 4))

    trg_stats = {"mean": np.full(3, 2.0), "scale": np.full(3, 0.5)}
    f2w = S3PRL_Feat2Wav(downstream, FakeInner(), trg_stats=trg_stats)
    latents = np.ones((5, 3), np.float32)
    y = f2w.decode(latents)
    assert y.shape == (1600,)
    # denormalized: 1 * 0.5 + 2 = 2.5
    np.testing.assert_allclose(seen["latents"], np.full((5, 3), 2.5))

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


def test_convert_shape_matcher_roundtrip():
    """A state_dict whose tensors have the right shapes converts; leftover
    or missing tensors fail loudly."""
    model = _tiny_model()
    latents = np.zeros((4, 12), np.float32)
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.asarray(latents)[None],
        deterministic=True,
    )["params"]
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    # build a fake torch state_dict with matching shapes (torch layouts)
    sd = {}
    for i, (path, v) in enumerate(flat):
        arr = np.asarray(v, np.float32)
        name = f"w{i}.lstm" if "lstm" in str(path).lower() else f"w{i}.weight"
        if arr.ndim == 2 and "lstm" not in name:
            arr = arr.T  # back to torch Linear layout
        elif arr.ndim == 3:
            arr = np.transpose(arr, (2, 1, 0))
        sd[name] = arr
    variables = convert_torch_taco2ar(sd, model, latents)
    out = model.apply(variables, jnp.asarray(latents)[None], deterministic=True)
    assert np.isfinite(np.asarray(out)).all()

    sd["extra.weight"] = np.zeros((3, 3, 3), np.float32)
    with pytest.raises(ValueError, match="unconverted|no torch tensor"):
        convert_torch_taco2ar(sd, model, latents)


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

"""Chunked AR decode (host early-exit) vs single-scan inference parity."""

import jax
import jax.numpy as jnp
import numpy as np

from seq2seq_vc_tpu.models import VTN


def _model_and_params():
    model = VTN(idim=80, odim=80, adim=32, aheads=2, elayers=1, eunits=64,
                dlayers=2, dunits=64, postnet_layers=2, postnet_chans=16,
                dprenet_units=16, decoder_reduction_factor=2)
    rng = np.random.default_rng(0)
    xs = rng.standard_normal((2, 64, 80)).astype(np.float32)
    ilens = np.asarray([64, 48], np.int32)
    ys = rng.standard_normal((2, 32, 80)).astype(np.float32)
    labels = np.zeros((2, 32), np.float32)
    olens = np.asarray([32, 24], np.int32)
    keys = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    params = model.init(keys, jnp.asarray(xs), jnp.asarray(ilens),
                        jnp.asarray(ys), jnp.asarray(labels),
                        jnp.asarray(olens), deterministic=True)
    return model, params, jnp.asarray(xs), jnp.asarray(ilens)


def _chunked(model, params, xs, ilens, key, thr, minr, maxr, chunk):
    st = model.apply(params, xs, ilens, key, maxr, method=VTN.decode_init)
    maxlen = st["cache"]["k"].shape[3]
    outs_c, probs_c = [], []
    t0, n_chunks = 0, 0
    while t0 < maxlen:
        st, outs, probs, _ = model.apply(
            params, st, t0, chunk, thr, minr, maxr, method=VTN.decode_chunk
        )
        outs_c.append(outs)
        probs_c.append(probs)
        t0 += chunk
        n_chunks += 1
        if bool(np.asarray(st["finished"]).all()):
            break
    outs = jnp.concatenate(outs_c, axis=1)
    out_lens = model.apply(params, st, maxr, method=VTN.decode_out_lens)
    outs = model.apply(params, outs, out_lens, method=VTN.decode_postnet)
    return (np.asarray(outs), np.concatenate([np.asarray(p) for p in probs_c], 1),
            np.asarray(out_lens), n_chunks, maxlen)


def test_chunked_decode_matches_inference_and_exits_early():
    model, params, xs, ilens = _model_and_params()
    key = jax.random.PRNGKey(7)
    thr, minr, maxr = 0.3, 0.0, 6.0  # low threshold: random model stops early

    ref = model.apply(params, xs, ilens, key, thr, minr, maxr,
                      method=VTN.inference)
    got_outs, got_probs, got_lens, n_chunks, maxlen = _chunked(
        model, params, xs, ilens, key, thr, minr, maxr, chunk=8
    )

    np.testing.assert_array_equal(got_lens, np.asarray(ref["out_lens"]))
    # prenet rng stream and decoder steps are identical -> probs match
    # exactly on the computed prefix
    L = got_probs.shape[1]
    np.testing.assert_allclose(
        got_probs, np.asarray(ref["probs"])[:, :L], atol=1e-6
    )
    # decode_postnet masks the dead tail past each item's stop to zero in
    # BOTH paths (reference-parity masking), so the postnet sees identical
    # inputs regardless of buffer length: the FULL valid prefix matches
    for b in range(xs.shape[0]):
        n = int(got_lens[b])
        np.testing.assert_allclose(
            got_outs[b, :n], np.asarray(ref["outs"])[b, :n], atol=1e-5,
        )
    # early exit actually happened (budget is maxlenratio 6 = way more
    # chunks than needed)
    assert n_chunks * 8 < maxlen, (n_chunks, maxlen)


def test_chunk_schedule_covers_budget_from_fixed_size_set():
    from seq2seq_vc_tpu.models.ar_driver import chunk_schedule

    base, cap = 32, 256
    allowed = {32, 64, 128, 256}
    for maxlen in [32, 64, 96, 224, 256, 480, 1504, 4096]:
        sizes = chunk_schedule(maxlen, base, cap)
        assert sum(sizes) == maxlen, (maxlen, sizes)
        assert set(sizes) <= allowed, (maxlen, sizes)
        # geometric growth: O(log) dispatches, not maxlen/base
        assert len(sizes) <= 4 + maxlen // cap, (maxlen, sizes)
    # degenerate base
    assert chunk_schedule(8, 8, 8) == [8]
    # expected-length first dispatch: opening chunk covers the estimate,
    # tail restarts the geometric ramp
    s = chunk_schedule(1504, 32, 256, first=200)
    assert s[0] == 256 and sum(s) == 1504 and set(s) <= allowed
    s = chunk_schedule(96, 32, 256, first=500)  # estimate beyond budget
    assert sum(s) == 96 and set(s) <= {32, 64}
    assert chunk_schedule(256, 32, 256, first=1)[0] == 32


def _driver_decode(model, params, xs, ilens, key, thr, minr, maxr,
                   speculate=True):
    from seq2seq_vc_tpu.models.ar_driver import ChunkedARDecoder

    drv = ChunkedARDecoder(
        model, VTN, threshold=thr, minlenratio=minr, maxlenratio=maxr,
        base_chunk=8, max_chunk=32, speculate=speculate,
    )
    out = drv(params, xs, ilens, key)
    return out, drv


def test_driver_matches_inference_with_early_stop():
    model, params, xs, ilens = _model_and_params()
    key = jax.random.PRNGKey(7)
    thr, minr, maxr = 0.3, 0.0, 6.0
    ref = model.apply(params, xs, ilens, key, thr, minr, maxr,
                      method=VTN.inference)
    for speculate in (True, False):
        out, drv = _driver_decode(
            model, params, xs, ilens, key, thr, minr, maxr, speculate
        )
        np.testing.assert_array_equal(
            np.asarray(out["out_lens"]), np.asarray(ref["out_lens"])
        )
        L = np.asarray(out["probs"]).shape[1]
        np.testing.assert_allclose(
            np.asarray(out["probs"]), np.asarray(ref["probs"])[:, :L],
            atol=1e-6,
        )
        # decoded frames cover every valid frame
        assert L >= int(np.asarray(ref["out_lens"]).max())
        got = np.asarray(out["outs"])
        for b in range(xs.shape[0]):
            n = int(np.asarray(ref["out_lens"])[b])
            if n > 16:  # postnet edge effect near the cut, as above
                np.testing.assert_allclose(
                    got[b, : n - 16],
                    np.asarray(ref["outs"])[b, : n - 16], atol=1e-4,
                )
        # the jit cache stays within the fixed size set
        assert drv.n_compiles <= 3


def test_driver_est_steps_matches_inference():
    model, params, xs, ilens = _model_and_params()
    key = jax.random.PRNGKey(7)
    thr, minr, maxr = 0.3, 0.0, 6.0
    ref = model.apply(params, xs, ilens, key, thr, minr, maxr,
                      method=VTN.inference)
    from seq2seq_vc_tpu.models.ar_driver import ChunkedARDecoder

    drv = ChunkedARDecoder(
        model, VTN, threshold=thr, minlenratio=minr, maxlenratio=maxr,
        base_chunk=8, max_chunk=32,
    )
    out = drv(params, xs, ilens, key, est_steps=40)
    np.testing.assert_array_equal(
        np.asarray(out["out_lens"]), np.asarray(ref["out_lens"])
    )
    L = np.asarray(out["probs"]).shape[1]
    np.testing.assert_allclose(
        np.asarray(out["probs"]), np.asarray(ref["probs"])[:, :L], atol=1e-6
    )


def test_driver_runs_to_budget_when_never_stopping():
    model, params, xs, ilens = _model_and_params()
    key = jax.random.PRNGKey(3)
    ref = model.apply(params, xs, ilens, key, 2.0, 0.0, 1.0,
                      method=VTN.inference)
    out, _ = _driver_decode(model, params, xs, ilens, key, 2.0, 0.0, 1.0)
    np.testing.assert_array_equal(
        np.asarray(out["out_lens"]), np.asarray(ref["out_lens"])
    )
    assert np.isfinite(np.asarray(out["outs"])).all()


def test_tts_driver_matches_inference():
    from seq2seq_vc_tpu.models import TransformerTTS
    from seq2seq_vc_tpu.models.ar_driver import ChunkedARDecoder

    model = TransformerTTS(
        idim=30, odim=80, adim=32, aheads=2, elayers=1, eunits=64,
        dlayers=2, dunits=64, postnet_layers=2, postnet_chans=16,
        dprenet_units=16, decoder_reduction_factor=1,
    )
    rng = np.random.default_rng(5)
    B, Tmax = 2, 12
    xs = jnp.asarray(rng.integers(1, 29, (B, Tmax)), jnp.int32)
    ilens = jnp.asarray([12, 8])
    ys = jnp.asarray(rng.standard_normal((B, 16, 80)), jnp.float32)
    labels = jnp.zeros((B, 16))
    olens = jnp.asarray([16, 12])
    keys = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    params = model.init(keys, xs, ilens, ys, labels, olens, deterministic=True)

    key = jax.random.PRNGKey(11)
    thr, minr, maxr = 0.3, 0.0, 5.0
    ref = model.apply(params, xs, ilens, key, thr, minr, maxr,
                      method=TransformerTTS.inference)
    drv = ChunkedARDecoder(
        model, TransformerTTS, threshold=thr, minlenratio=minr,
        maxlenratio=maxr, base_chunk=8, max_chunk=32,
    )
    out = drv(params, xs, ilens, key)
    np.testing.assert_array_equal(
        np.asarray(out["out_lens"]), np.asarray(ref["out_lens"])
    )
    L = np.asarray(out["probs"]).shape[1]
    np.testing.assert_allclose(
        np.asarray(out["probs"]), np.asarray(ref["probs"])[:, :L], atol=1e-6
    )


def test_chunked_decode_runs_to_budget_when_never_stopping():
    model, params, xs, ilens = _model_and_params()
    key = jax.random.PRNGKey(3)
    got_outs, _, got_lens, n_chunks, maxlen = _chunked(
        model, params, xs, ilens, key, 2.0, 0.0, 1.0, chunk=8
    )
    # threshold 2.0 never trips: every item runs to its maxlen_b — the
    # same budget the single-scan inference computes (encoder-grid hlens)
    ref = model.apply(params, xs, ilens, key, 2.0, 0.0, 1.0,
                      method=VTN.inference)
    np.testing.assert_array_equal(got_lens, np.asarray(ref["out_lens"]))
    assert (got_lens > 0).all()
    assert np.isfinite(got_outs).all()
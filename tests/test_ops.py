"""Ops tests: MAS vs independent numpy DP, CTC forward-sum vs torch,
upsampling ops vs direct loops."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from seq2seq_vc_tpu.ops import (
    average_by_duration,
    beta_binomial_prior,
    forward_sum_loss,
    gaussian_upsampling,
    length_regulator,
    make_non_pad_mask,
    make_pad_mask,
    monotonic_alignment_search,
    scaled_dot_attention,
    subsequent_mask,
    target_mask,
    viterbi_decode,
)


def np_mas(log_p_attn):
    """Independent numpy MAS (Glow-TTS alignment DP, arXiv:2005.11129)."""
    T_mel, T_inp = log_p_attn.shape
    lp = log_p_attn.T
    Q = np.full((T_inp, T_mel), -np.inf)
    for j in range(T_mel):
        Q[0, j] = lp[0, : j + 1].sum()
    for j in range(1, T_mel):
        for i in range(1, min(j + 1, T_inp)):
            Q[i, j] = max(Q[i - 1, j - 1], Q[i, j - 1]) + lp[i, j]
    A = np.full((T_mel,), T_inp - 1, dtype=np.int64)
    for j in range(T_mel - 2, -1, -1):
        i_a, i_b = A[j + 1] - 1, A[j + 1]
        if i_b == 0:
            A[j] = 0
        elif Q[i_a, j] >= Q[i_b, j]:
            A[j] = i_a
        else:
            A[j] = i_b
    return A


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_mas_matches_numpy_dp(seed):
    rng = np.random.default_rng(seed)
    B, T_feats, T_text = 3, 37, 11
    feats_lens = np.array([37, 20, 13])
    text_lens = np.array([11, 7, 4])
    logits = rng.standard_normal((B, T_feats, T_text)).astype(np.float32) * 2
    # log-softmax over text axis like AlignmentModule output
    lse = np.log(np.exp(logits).sum(-1, keepdims=True))
    log_p = logits - lse

    paths = np.asarray(
        monotonic_alignment_search(
            jnp.asarray(log_p), jnp.asarray(text_lens), jnp.asarray(feats_lens)
        )
    )
    for b in range(B):
        want = np_mas(log_p[b, : feats_lens[b], : text_lens[b]].astype(np.float64))
        np.testing.assert_array_equal(paths[b, : feats_lens[b]], want)


def test_viterbi_decode_durations_and_loss():
    rng = np.random.default_rng(10)
    B, T_feats, T_text = 2, 25, 6
    feats_lens = np.array([25, 17])
    text_lens = np.array([6, 3])
    logits = rng.standard_normal((B, T_feats, T_text)).astype(np.float32)
    log_p = logits - np.log(np.exp(logits).sum(-1, keepdims=True))

    ds, bin_loss = viterbi_decode(
        jnp.asarray(log_p), jnp.asarray(text_lens), jnp.asarray(feats_lens)
    )
    ds, bin_loss = np.asarray(ds), float(bin_loss)

    want_loss = 0.0
    for b in range(B):
        path = np_mas(log_p[b, : feats_lens[b], : text_lens[b]].astype(np.float64))
        want = np.bincount(path, minlength=T_text)
        np.testing.assert_array_equal(ds[b], want)
        assert ds[b].sum() == feats_lens[b]
        want_loss -= log_p[b, np.arange(feats_lens[b]), path].mean()
    assert bin_loss == pytest.approx(want_loss / B, rel=1e-5)


def test_mas_clean_diagonal():
    """A sharply diagonal log-prob matrix must produce a diagonal path."""
    T_feats, T_text = 20, 5
    log_p = np.full((1, T_feats, T_text), -10.0, np.float32)
    for t in range(T_feats):
        log_p[0, t, min(t // 4, T_text - 1)] = 0.0
    ds, _ = viterbi_decode(jnp.asarray(log_p), jnp.asarray([T_text]), jnp.asarray([T_feats]))
    np.testing.assert_array_equal(np.asarray(ds)[0], [4, 4, 4, 4, 4])


def test_forward_sum_matches_torch_ctc():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(11)
    B, T_feats, T_text = 3, 30, 7
    olens = np.array([30, 22, 15])
    ilens = np.array([7, 5, 2])
    log_p = rng.standard_normal((B, T_feats, T_text)).astype(np.float32)

    got = float(forward_sum_loss(jnp.asarray(log_p), jnp.asarray(ilens), jnp.asarray(olens)))

    blank = math.log(math.exp(-1))
    lp_pd = np.concatenate([np.full((B, T_feats, 1), blank, np.float32), log_p], axis=2)
    want = 0.0
    for b in range(B):
        target = torch.arange(1, ilens[b] + 1).unsqueeze(0)
        cur = torch.from_numpy(lp_pd[b, : olens[b], : ilens[b] + 1]).unsqueeze(1)
        want += F.ctc_loss(
            log_probs=cur,
            targets=target,
            input_lengths=torch.tensor([olens[b]]),
            target_lengths=torch.tensor([ilens[b]]),
            zero_infinity=True,
        ).item()
    want /= B
    assert got == pytest.approx(want, rel=1e-4)


def test_beta_binomial_prior_properties():
    prior = beta_binomial_prior(np.array([5, 3]), np.array([12, 8]), 6, 14)
    assert prior.shape == (2, 14, 6)
    # valid region: rows are log-pmfs over k=0..N-1 of BetaBinom(N) — they
    # sum to <= 1 (the k=N term is omitted, as in the reference)
    row = np.exp(prior[0, :12, :5].astype(np.float64))
    assert ((row.sum(-1) > 0.25) & (row.sum(-1) <= 1.0 + 1e-9)).all()
    # padding stays at the sentinel
    assert (prior[0, 12:, :] < -1e29).all()
    # prior mass moves monotonically rightward over time
    centers = (row * np.arange(5)).sum(-1)
    assert centers[-1] > centers[0]


def test_gaussian_upsampling_matches_direct():
    rng = np.random.default_rng(12)
    B, T_text, D, T_feats = 2, 4, 3, 12
    hs = rng.standard_normal((B, T_text, D)).astype(np.float32)
    ds = np.array([[3, 4, 2, 3], [2, 2, 2, 0]], np.float32)
    feats_lens = np.array([12, 6])
    text_lens = np.array([4, 3])
    h_masks = np.asarray(make_non_pad_mask(jnp.asarray(feats_lens), T_feats))
    d_masks = np.asarray(make_non_pad_mask(jnp.asarray(text_lens), T_text))

    got = np.asarray(
        gaussian_upsampling(
            jnp.asarray(hs), jnp.asarray(ds), jnp.asarray(h_masks), jnp.asarray(d_masks)
        )
    )

    for b in range(B):
        t = np.arange(T_feats, dtype=np.float64) * h_masks[b]
        c = ds[b].cumsum() - ds[b] / 2
        energy = -0.1 * (t[:, None] - c[None, :]) ** 2
        energy[:, ~d_masks[b]] = -np.inf
        e = np.exp(energy - energy.max(-1, keepdims=True))
        p = e / e.sum(-1, keepdims=True)
        want = p @ hs[b]
        np.testing.assert_allclose(got[b], want, atol=1e-5)


def test_length_regulator_matches_repeat_interleave():
    rng = np.random.default_rng(13)
    hs = rng.standard_normal((2, 4, 3)).astype(np.float32)
    ds = np.array([[2, 0, 3, 1], [1, 1, 0, 0]], np.int32)
    got = np.asarray(length_regulator(jnp.asarray(hs), jnp.asarray(ds), t_feats=8))
    for b in range(2):
        want = np.repeat(hs[b], ds[b], axis=0)
        np.testing.assert_allclose(got[b, : len(want)], want, atol=1e-6)
        np.testing.assert_allclose(got[b, len(want):], 0.0)


def test_average_by_duration_matches_loop():
    rng = np.random.default_rng(14)
    B, T_text, T_feats = 2, 4, 10
    ds = np.array([[3, 2, 4, 1], [5, 3, 0, 0]], np.int32)
    xs = rng.standard_normal((B, T_feats)).astype(np.float32)
    text_lens = np.array([4, 2])
    feats_lens = np.array([10, 8])
    got = np.asarray(
        average_by_duration(
            jnp.asarray(ds), jnp.asarray(xs), jnp.asarray(text_lens), jnp.asarray(feats_lens)
        )
    )
    for b in range(B):
        cum = np.concatenate([[0], ds[b, : text_lens[b]].cumsum()])
        for n in range(text_lens[b]):
            seg = xs[b, : feats_lens[b]][cum[n] : cum[n + 1]]
            want = seg.mean() if len(seg) else 0.0
            assert got[b, n] == pytest.approx(want, abs=1e-5)


def test_masks():
    lens = jnp.asarray([3, 1])
    pad = np.asarray(make_pad_mask(lens, 4))
    np.testing.assert_array_equal(pad, [[False, False, False, True], [False, True, True, True]])
    np.testing.assert_array_equal(np.asarray(make_non_pad_mask(lens, 4)), ~pad)
    sub = np.asarray(subsequent_mask(3))
    np.testing.assert_array_equal(sub, np.tril(np.ones((3, 3), bool)))
    tm = np.asarray(target_mask(lens, 4))
    assert tm.shape == (2, 4, 4)
    assert tm[0, 2, :3].all() and not tm[0, 2, 3]
    # reference formula (vtn.py:574-602): keys masked at pad, query rows NOT
    # masked — padded queries attend the valid causal prefix (required for
    # postnet-tap parity with the reference; see test_reference_parity)
    np.testing.assert_array_equal(tm[1, 3], [True, False, False, False])


def test_scaled_dot_attention_softmax_and_mask():
    rng = np.random.default_rng(15)
    q = jnp.asarray(rng.standard_normal((1, 2, 3, 4)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 2, 5, 4)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 2, 5, 4)), jnp.float32)
    mask = jnp.ones((1, 1, 3, 5), bool).at[:, :, :, 4].set(False)
    out, w = scaled_dot_attention(q, k, v, mask=mask, return_weights=True)
    w = np.asarray(w)
    np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(w[..., 4], 0.0)
    assert out.shape == (1, 2, 3, 4)

"""Benchmark: flagship throughput on one chip (train steps, NAR/AR decode).

Prints ONE JSON line. Primary metric (``value``, VERDICT r4 #4): the
flagship AAS-VC **train step in ms** (batch 16 x 512 frames, arctic vc2
config scale: adim 384, 4+4 conformer layers, post-encoder reduction 4,
stochastic duration predictor, compute_dtype=bfloat16, fused rel-scores
attention) — LOWER IS BETTER. This is the tunnel-robust comparator: the
NAR inference number swings +/-13% with remote-tunnel conditions on
identical code (round-3/4 measured facts, e.g. the r1->r4 headline
"decline" 210k->162k mel-f/s while the train step got strictly faster
81.9->77.5 ms), while the train step holds within ~1 ms across rounds.

``vs_baseline``: the BASELINE.json north star is end-to-end wav->wav RTF
<= 0.02 per chip; vs_baseline = 0.02 / measured single-stream wav2wav RTF
(>1 beats the target; carried by the same JSON line in ``extra``). Note
vs_baseline is dispatch-latency sensitive (tunnel health) — the headline
``value`` is the cross-round number.

``extra`` carries every other tracked axis:
- nar_mel_frames_per_sec (+ dispersion over 5 passes): full-size AAS-VC
  batched NAR conversion throughput, counting COMPUTED frames.
- train_mel_frames_per_sec / train_tflops_per_sec: the headline step as
  throughput/MFU.
- vtn_train_step_ms / tts_train_step_ms (VERDICT r4 #7): the AR (VTN,
  bf16) and TTS (TransformerTTS + guided attn, fp32) flagship train steps.
- gan_finetune_step_ms (+ 50 k-step extrapolation vs the reference's
  16-24 h V100 anecdote, VERDICT r4 #3): urhythmic HiFi-GAN G+D step at
  the reference hypers.
- ar_decode_mel_frames_per_sec: VTN chunked AR decode (production driver),
  batch 4, full 256-step budget.
- wav2wav_rtf_single_stream: the single-jit pipeline (log-mel -> AAS-VC ->
  chunked HiFi-GAN).

All timings are fetch-verified: iteration i+1 consumes iteration i's
output and the timed region ends with a host np.asarray fetch of the final
result (block_until_ready alone can return early on this runtime).

Every metric is the MEDIAN of >= 3 timed passes (VERDICT r2 #2: a single
sample let a -6.9% run-variance drift masquerade as a regression); the NAR
metric additionally reports min/median/max over 5 passes plus a
tunnel-health probe timing (``dispersion`` field).
"""

import json
import os
import statistics
import time

import numpy as np

# S2S_BENCH_SMOKE=1: tiny-model/short-loop CPU shakeout of every bench code
# path (correctness only — the printed numbers are meaningless). Used before
# committing bench changes; the real run uses the flagship shapes below.
SMOKE = os.environ.get("S2S_BENCH_SMOKE") == "1"
N_PASSES = 1 if SMOKE else 3  # timed passes per metric; report the median
N_PASSES_HEADLINE = 2 if SMOKE else 5  # headline NAR: median + min/max

# flagship model scale (arctic vc1/vc2 conf sizes) vs smoke scale
ADIM = 32 if SMOKE else 384
LAYERS = 2 if SMOKE else 4  # AASVC conformer stacks (4+4)
VTN_LAYERS = 2 if SMOKE else 6  # VTN/TTS transformer stacks (6+6)
UNITS = 64 if SMOKE else 1536
PN_CHANS = 16 if SMOKE else 256
BATCH = 2 if SMOKE else 16
SEQ = 64 if SMOKE else 512
N_ITER_SCALE = 10 if SMOKE else 1  # divide iteration counts in smoke mode


def _iters(n):
    return max(1, n // N_ITER_SCALE)


def median_of(passes):
    return statistics.median(passes)


def dispersion(passes, nd=1):
    return {
        "min": round(min(passes), nd),
        "median": round(statistics.median(passes), nd),
        "max": round(max(passes), nd),
        "n_passes": len(passes),
    }


def probe_dispatch_ms(jax, jnp, n=20):
    """Tunnel-health probe: median host->device->host round-trip of a tiny
    chained jitted op. Dispatch-latency-sensitive metrics (AR decode,
    wav2wav) only compare across rounds at similar probe times."""
    f = jax.jit(lambda a: a * 1.000001 + 1.0)
    x = jnp.zeros((8,), jnp.float32)
    x = f(x)
    _ = np.asarray(x)  # compile + settle
    ts = []
    for _ in range(n):
        t0 = time.time()
        x = f(x)
        _ = np.asarray(x)  # full round trip
        ts.append((time.time() - t0) * 1e3)
    return round(statistics.median(ts), 2)


def bench_nar_inference(jax, jnp):
    from seq2seq_vc_tpu.models import AASVC

    model = AASVC(
        idim=80, odim=80, adim=ADIM, aheads=2, elayers=LAYERS, eunits=UNITS,
        dlayers=LAYERS, dunits=UNITS, postnet_layers=5, postnet_chans=PN_CHANS,
        post_encoder_reduction_factor=4, duration_predictor_type="stochastic",
        conformer_enc_kernel_size=15, conformer_dec_kernel_size=15,
        # round-4 interleaved same-process A/B (bench_ablate --mode
        # nar_fused): fused >= xla in both pairs (126.8k vs 98.2k, 158.1k
        # vs 136.7k mel-f/s) — the band IS worth skipping at inference too
        attention_backend="fused",
    )
    rng = np.random.default_rng(0)
    B, T = (2, 64) if SMOKE else (4, 512)
    # keep host numpy here; pass into jit as arguments (closure-captured
    # device arrays stall MLIR lowering over the remote TPU tunnel)
    src = rng.standard_normal((B, T, 80)).astype(np.float32)
    slens = (T - (T // 8) * np.arange(B)).astype(np.int32)
    tgt = rng.standard_normal((B, T, 80)).astype(np.float32)
    tlens = slens.copy()

    def _init(s, sl, t, tl, seed):
        keys = {
            "params": jax.random.PRNGKey(seed),
            "dropout": jax.random.PRNGKey(seed + 1),
            "noise": jax.random.PRNGKey(seed + 2),
        }
        return model.init(keys, s, sl, t, tl, deterministic=True)

    params = jax.jit(_init)(src, slens, tgt, tlens, 0)

    # chained protocol: iteration i+1's input depends on iteration i's full
    # output, so executions cannot overlap or be elided by the async runtime
    max_out = 32 if SMOKE else 160

    def step(p, s, sl, k):
        out = model.apply(
            p, s, sl, max_output_frames=max_out,
            method=AASVC.inference, rngs={"noise": k},
        )
        s_next = s + 1e-9 * jnp.mean(out["outs"])
        return s_next, out["out_lens"]

    run = jax.jit(step)
    src_d = jnp.asarray(src)
    slens_d = jnp.asarray(slens)
    src_d, _ = run(params, src_d, slens_d, jax.random.PRNGKey(3))
    jax.block_until_ready(src_d)  # compile

    n_iter = _iters(30)
    keys = [jax.random.PRNGKey(10 + i) for i in range(n_iter)]
    _ = np.asarray(keys[-1])  # force key materialization
    # throughput counts COMPUTED frames (B x max_output_frames x r): shapes
    # are static under jit, so that is exactly the work the chip did every
    # call. Counting the random-duration-dependent *valid* lens made the
    # r1->r2 headline drift partly metric noise — any numerics change
    # shifts the stochastic duration predictor's random-init outputs.
    frames_per_call = src_d.shape[0] * max_out  # B x max_output_frames (r_d = 1)
    rates = []
    for _pass in range(N_PASSES_HEADLINE):
        t0 = time.time()
        lens = None
        for i in range(n_iter):
            src_d, lens = run(params, src_d, slens_d, keys[i])
        _ = int(np.asarray(lens).sum())  # terminal host fetch
        dt = (time.time() - t0) / n_iter
        rates.append(frames_per_call / dt)
    return rates


def bench_train_step(jax, jnp):
    import optax

    from seq2seq_vc_tpu.losses import L1Loss
    from seq2seq_vc_tpu.models import AASVC
    from seq2seq_vc_tpu.ops.forward_sum import beta_binomial_prior, forward_sum_loss

    model = AASVC(
        idim=80, odim=80, adim=ADIM, aheads=2, elayers=LAYERS, eunits=UNITS,
        dlayers=LAYERS, dunits=UNITS, postnet_layers=5, postnet_chans=PN_CHANS,
        post_encoder_reduction_factor=4, duration_predictor_type="stochastic",
        conformer_enc_kernel_size=15, conformer_dec_kernel_size=15,
        compute_dtype="bfloat16",
        # fused rel-scores kernel (ops/rel_scores.py): same math as the
        # dense path modulo reassociation, the (T, 2T-1) band tensor never
        # materializes. Same-day A/B on the chip: 78.2 vs 84.1 ms/step
        attention_backend="fused",
    )
    B, T = BATCH, SEQ
    rng = np.random.default_rng(0)
    xs = rng.standard_normal((B, T, 80)).astype(np.float32)
    ys = rng.standard_normal((B, T, 80)).astype(np.float32)
    lens = np.linspace(T // 2, T, B).astype(np.int32)

    def _init(xs, ilens, ys, olens, seed):
        keys = {
            "params": jax.random.PRNGKey(seed),
            "dropout": jax.random.PRNGKey(seed + 1),
            "noise": jax.random.PRNGKey(seed + 2),
        }
        return model.init(keys, xs, ilens, ys, olens, deterministic=True)

    params = jax.jit(_init)(xs, lens, ys, lens, 0)
    l1_loss = L1Loss()
    prior = beta_binomial_prior(lens // 4, lens, T // 4, T)
    tx = optax.adamw(1e-4)
    opt_state = jax.jit(tx.init)(params)

    def step(params, opt_state, xs, ilens, ys, olens, prior, seed):
        def loss_fn(params):
            rngs = {
                "dropout": jax.random.PRNGKey(seed),
                "noise": jax.random.PRNGKey(seed + 1),
            }
            out = model.apply(
                params, xs, ilens, ys, olens, deterministic=False, rngs=rngs
            )
            l1 = l1_loss(out["after_outs"], out["before_outs"], out["ys"], out["olens"])
            fsum = forward_sum_loss(
                out["log_p_attn"] + prior, out["ilens"], out["olens_reduced"]
            )
            return l1 + 2.0 * (fsum + out["bin_loss"]) + out["dur_nll"]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    fn = jax.jit(step, donate_argnums=(0, 1))
    # .lower() on the SAME wrapper shares the executable cache with the timed
    # calls below — a second jax.jit(step) would compile the step twice
    # (1-3 min each over the remote-compile tunnel)
    lowered = fn.lower(params, opt_state, xs, lens, ys, lens, prior, 0)
    try:
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
    except Exception:
        flops = 0.0

    xs_d, ys_d, lens_d, prior_d = (
        jax.device_put(xs), jax.device_put(ys), jax.device_put(lens),
        jax.device_put(np.asarray(prior)),
    )
    params, opt_state, loss = fn(params, opt_state, xs_d, lens_d, ys_d, lens_d, prior_d, 0)
    _ = float(np.asarray(loss))  # compile + settle

    n_iter = _iters(20)
    dts = []
    for _pass in range(N_PASSES):
        t0 = time.time()
        for i in range(n_iter):
            # params/opt_state chain through donation: steps cannot overlap
            params, opt_state, loss = fn(
                params, opt_state, xs_d, lens_d, ys_d, lens_d, prior_d, i + 1
            )
        final = float(np.asarray(loss))  # terminal host fetch
        dts.append((time.time() - t0) / n_iter)
        assert np.isfinite(final)
    dt = median_of(dts)
    frames = int(lens.sum())
    return {
        "train_mel_frames_per_sec": round(frames / dt, 1),
        "train_step_ms": round(dt * 1e3, 2),
        "train_step_ms_dispersion": dispersion([d * 1e3 for d in dts], nd=2),
        "train_tflops_per_sec": round(flops / dt / 1e12, 2) if flops else None,
    }


def bench_vtn_train_step(jax, jnp):
    """VTN (AR flagship) train step at the arctic vc1 conf scale
    (vtn.n80.v1: adim 384, aheads 4, 6+6 layers, units 1536, postnet 5x256,
    decoder_reduction_factor 4, bce_pos_weight 10), B16 x T512,
    compute_dtype=bfloat16. Loss = Seq2SeqLoss (the full ARVCTrainer
    assembly — the reference VTN's guided-attn branch is dead code:
    reference models/vtn.py:277-299 passes a raw list to the loss, which
    raises). VERDICT r4 weak #7: the transformer (non-conformer) train
    path gets a tracked number."""
    import optax

    from seq2seq_vc_tpu.losses import get_criterion
    from seq2seq_vc_tpu.models import VTN

    model = VTN(
        idim=80, odim=80, adim=ADIM, aheads=4, elayers=VTN_LAYERS, eunits=UNITS,
        dlayers=VTN_LAYERS, dunits=UNITS, postnet_layers=5, postnet_chans=PN_CHANS,
        decoder_reduction_factor=4, compute_dtype="bfloat16",
    )
    B, T = BATCH, SEQ
    rng = np.random.default_rng(0)
    xs = rng.standard_normal((B, T, 80)).astype(np.float32)
    ys = rng.standard_normal((B, T, 80)).astype(np.float32)
    lens = (np.linspace(T // 2, T, B).astype(np.int32) // 4) * 4
    labels = np.zeros((B, T), np.float32)
    labels[np.arange(B), lens - 1] = 1.0

    def _init(xs, ilens, ys, labels, olens, seed):
        keys = {
            "params": jax.random.PRNGKey(seed),
            "dropout": jax.random.PRNGKey(seed + 1),
        }
        return model.init(keys, xs, ilens, ys, labels, olens, deterministic=True)

    params = jax.jit(_init)(xs, lens, ys, labels, lens, 0)
    crit = get_criterion("Seq2SeqLoss", bce_pos_weight=10.0)
    tx = optax.adamw(1e-4)
    opt_state = jax.jit(tx.init)(params)

    def step(params, opt_state, xs, ilens, ys, labels, olens, seed):
        def loss_fn(params):
            out = model.apply(
                params, xs, ilens, ys, labels, olens, deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(seed)},
            )
            l1, bce = crit(
                out["after_outs"], out["before_outs"], out["logits"],
                out["ys"], out["labels"], out["olens"],
            )
            return l1 + bce

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    fn = jax.jit(step, donate_argnums=(0, 1))
    xs_d, ys_d, lens_d, lab_d = (
        jax.device_put(xs), jax.device_put(ys), jax.device_put(lens),
        jax.device_put(labels),
    )
    params, opt_state, loss = fn(params, opt_state, xs_d, lens_d, ys_d, lab_d, lens_d, 0)
    _ = float(np.asarray(loss))  # compile + settle
    n_iter = _iters(20)
    dts = []
    for _pass in range(N_PASSES):
        t0 = time.time()
        for i in range(n_iter):
            params, opt_state, loss = fn(
                params, opt_state, xs_d, lens_d, ys_d, lab_d, lens_d, i + 1
            )
        final = float(np.asarray(loss))  # terminal host fetch
        dts.append((time.time() - t0) / n_iter)
        assert np.isfinite(final)
    return round(median_of(dts) * 1e3, 2)


def bench_tts_train_step(jax, jnp):
    """TransformerTTS train step at the ljspeech tts1 conf scale
    (transformer_tts.v1: adim 384, aheads 4, 6+6, units 1536, r 1, guided
    attn 2 heads x 2 layers, bce_pos_weight 5), B16, text 128 tokens ->
    512 mel frames, fp32 (the TTS model has no bf16 switch — its recipes
    never needed one). Loss = Seq2SeqLoss + GuidedMultiHeadAttentionLoss
    (the reference ar_tts trainer assembly, trainers/ar_tts.py:39-54)."""
    import optax

    from seq2seq_vc_tpu.losses import get_criterion
    from seq2seq_vc_tpu.models import TransformerTTS

    model = TransformerTTS(
        idim=78, odim=80, adim=ADIM, aheads=4, elayers=VTN_LAYERS, eunits=UNITS,
        dlayers=VTN_LAYERS, dunits=UNITS, postnet_layers=5, postnet_chans=PN_CHANS,
        decoder_reduction_factor=1, use_guided_attn_loss=True,
        num_heads_applied_guided_attn=2, num_layers_applied_guided_attn=2,
    )
    B, L, T = BATCH, (16 if SMOKE else 128), SEQ
    rng = np.random.default_rng(0)
    xs = rng.integers(1, 78, (B, L)).astype(np.int32)
    ilens = np.linspace(L // 2, L, B).astype(np.int32)
    ys = rng.standard_normal((B, T, 80)).astype(np.float32)
    olens = np.linspace(T // 2, T, B).astype(np.int32)
    labels = np.zeros((B, T), np.float32)
    labels[np.arange(B), olens - 1] = 1.0

    def _init(xs, ilens, ys, labels, olens, seed):
        keys = {
            "params": jax.random.PRNGKey(seed),
            "dropout": jax.random.PRNGKey(seed + 1),
        }
        return model.init(keys, xs, ilens, ys, labels, olens, deterministic=True)

    params = jax.jit(_init)(xs, ilens, ys, labels, olens, 0)
    s2s = get_criterion("Seq2SeqLoss", bce_pos_weight=5.0)
    ga = get_criterion("GuidedMultiHeadAttentionLoss", sigma=0.4, alpha=1.0)
    tx = optax.adamw(1e-4)
    opt_state = jax.jit(tx.init)(params)

    def step(params, opt_state, xs, ilens, ys, labels, olens, seed):
        def loss_fn(params):
            out = model.apply(
                params, xs, ilens, ys, labels, olens, deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(seed)},
            )
            l1, bce = s2s(
                out["after_outs"], out["before_outs"], out["logits"],
                out["ys"], out["labels"], out["olens"],
            )
            ga_loss = ga(out["att_ws"], out["ilens"], out["olens_in"])
            return l1 + bce + ga_loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    fn = jax.jit(step, donate_argnums=(0, 1))
    xs_d, il_d, ys_d, lab_d, ol_d = (
        jax.device_put(xs), jax.device_put(ilens), jax.device_put(ys),
        jax.device_put(labels), jax.device_put(olens),
    )
    params, opt_state, loss = fn(params, opt_state, xs_d, il_d, ys_d, lab_d, ol_d, 0)
    _ = float(np.asarray(loss))  # compile + settle
    n_iter = _iters(20)
    dts = []
    for _pass in range(N_PASSES):
        t0 = time.time()
        for i in range(n_iter):
            params, opt_state, loss = fn(
                params, opt_state, xs_d, il_d, ys_d, lab_d, ol_d, i + 1
            )
        final = float(np.asarray(loss))  # terminal host fetch
        dts.append((time.time() - t0) / n_iter)
        assert np.isfinite(final)
    return round(median_of(dts) * 1e3, 2)


def bench_gan_finetune_step(jax, jnp):
    """Urhythmic HiFi-GAN fine-tune G+D step at the reference hypers
    (reference urhythmic_fine_tune_vocoder.py:39-51: batch 8, segment 8320
    samples, hop 320, AdamW lr 5e-5 betas (0.8, 0.99) wd 1e-2) through the
    production trainer (urhythmic/vocoder_train.HifiganTrainer: one jitted
    step, discriminator LSGAN on detached fakes + generator 45*mel-L1 +
    2*FM + adv). The reference anecdote is 16-24 h / 50 k steps on a V100
    (BASELINE.md) = 1.15-1.73 s/step; the returned dict carries the
    measured ms/step, the 50 k-step extrapolation, and the speedup range.
    Fetch-verified: train_step() fetches every metric to host floats each
    call and the G/D states chain through donation."""
    from seq2seq_vc_tpu.urhythmic.vocoder_train import (
        BATCH_SIZE, HOP_LENGTH, SEGMENT_LENGTH, HifiganTrainer,
    )

    trainer = HifiganTrainer()
    rng = np.random.default_rng(0)
    bsz = 2 if SMOKE else BATCH_SIZE
    seg = 7 * HOP_LENGTH if SMOKE else SEGMENT_LENGTH
    n_frames = seg // HOP_LENGTH
    units = rng.standard_normal(
        (bsz, n_frames, trainer.generator.in_channels)
    ).astype(np.float32)
    wavs = (0.1 * rng.standard_normal((bsz, seg))).astype(np.float32)
    trainer.train_step(units, wavs)  # init + compile
    trainer.train_step(units, wavs)  # settle
    n_iter = _iters(10)
    dts = []
    for _pass in range(N_PASSES):
        t0 = time.time()
        for _ in range(n_iter):
            m = trainer.train_step(units, wavs)  # fetches metrics to host
        dts.append((time.time() - t0) / n_iter)
        assert np.isfinite(m["loss_generator"])
    step_s = median_of(dts)
    hours_50k = 50000 * step_s / 3600.0
    return {
        "gan_finetune_step_ms": round(step_s * 1e3, 2),
        "gan_finetune_50k_steps_hours": round(hours_50k, 2),
        # reference anecdote: 16-24 h on V100 for the same 50 k steps
        "gan_finetune_speedup_vs_v100": [
            round(16.0 / hours_50k, 1), round(24.0 / hours_50k, 1),
        ],
    }


def bench_ar_decode(jax, jnp):
    from seq2seq_vc_tpu.models import VTN

    model = VTN(
        idim=80, odim=80, adim=ADIM, aheads=4, elayers=VTN_LAYERS, eunits=UNITS,
        dlayers=VTN_LAYERS, dunits=UNITS, postnet_layers=5, postnet_chans=PN_CHANS,
        decoder_reduction_factor=4,
    )
    rng = np.random.default_rng(0)
    B, T = (2, 32) if SMOKE else (4, 256)
    src = rng.standard_normal((B, T, 80)).astype(np.float32)
    slens = (T - (T // 8) * np.arange(B)).astype(np.int32)

    labels = np.zeros((B, T), np.float32)

    def _init(s, sl, lab, seed):
        keys = {
            "params": jax.random.PRNGKey(seed),
            "dropout": jax.random.PRNGKey(seed + 1),
        }
        return model.init(keys, s, sl, s, lab, sl, deterministic=True)

    params = jax.jit(_init)(src, slens, labels, 0)

    # production decode path (bin/vc_decode.py): ChunkedARDecoder with
    # geometric chunk growth + speculative dispatch. maxlenratio 4.0 ->
    # 256-step KV budget; threshold 1.1 never stops early, so every decode
    # runs the full budget (raw AR throughput incl. postnet + out_lens,
    # exactly the frames a real decode computes). 4 chunk dispatches per
    # decode (32+64+128+32) vs 8 fixed-size ones before round 3.
    from seq2seq_vc_tpu.models.ar_driver import ChunkedARDecoder

    drv = ChunkedARDecoder(
        model, VTN, threshold=1.1, minlenratio=0.0, maxlenratio=4.0,
        base_chunk=32, max_chunk=256,
    )
    src_d = jnp.asarray(src)
    slens_d = jnp.asarray(slens)
    maxlen = int(
        drv._init_fn(params, src_d, slens_d, jax.random.PRNGKey(0))
        ["cache"]["k"].shape[3]
    )
    out = drv(params, src_d, slens_d, jax.random.PRNGKey(0))
    jax.block_until_ready(out["outs"])  # compile all chunk sizes + postnet

    n_iter = _iters(4)  # full decodes of maxlen steps each
    r = 4
    rates = []
    for _pass in range(N_PASSES):
        t0 = time.time()
        out_sum = 0.0
        for it in range(n_iter):
            out = drv(params, src_d, slens_d, jax.random.PRNGKey(it))
            # fetch per decode keeps the timing honest (a real decode fetches
            # its output too) and chains the loop for the async runtime
            out_sum += float(np.asarray(out["outs"]).mean())
        dt = time.time() - t0
        assert np.isfinite(out_sum)
        rates.append(maxlen * n_iter * r * B / dt)
    return median_of(rates)


def bench_wav2wav(jax, jnp):
    """BASELINE.md north-star: single-stream wav->wav RTF through the
    single-jit pipeline (log-mel -> normalize -> AAS-VC -> stat chain ->
    chunked HiFi-GAN). Random-init weights (timing only); fetch-verified:
    every call round-trips the waveform to the host."""
    from seq2seq_vc_tpu.models import AASVC
    from seq2seq_vc_tpu.pipeline import Wav2WavConverter
    from seq2seq_vc_tpu.vocoder.hifigan import HifiganGenerator

    model = AASVC(
        idim=80, odim=80, adim=ADIM, aheads=2, elayers=LAYERS, eunits=UNITS,
        dlayers=LAYERS, dunits=UNITS, postnet_layers=5, postnet_chans=PN_CHANS,
        post_encoder_reduction_factor=4, duration_predictor_type="stochastic",
        conformer_enc_kernel_size=15, conformer_dec_kernel_size=15,
        attention_backend="fused",  # matches the shipped-conf serving path
    )
    rng = np.random.default_rng(0)
    B, T = 1, 128
    src = rng.standard_normal((B, T, 80)).astype(np.float32)
    lens = np.asarray([T], np.int32)

    def _init(s, sl, seed):
        keys = {
            "params": jax.random.PRNGKey(seed),
            "dropout": jax.random.PRNGKey(seed + 1),
            "noise": jax.random.PRNGKey(seed + 2),
        }
        return model.init(keys, s, sl, s, sl, deterministic=True)

    params = jax.jit(_init)(src, lens, 0)

    voc = HifiganGenerator(
        in_channels=80, upsample_factors=(8, 8, 2, 2),
        upsample_kernel_sizes=(16, 16, 4, 4),
    )
    mel0 = rng.standard_normal((1, 64, 80)).astype(np.float32)
    vparams = jax.jit(voc.init)(jax.random.PRNGKey(1), mel0)

    stats = {"mean": np.zeros(80, np.float32), "scale": np.ones(80, np.float32)}
    conv = Wav2WavConverter(
        model, params, voc, vparams, stats, stats,
        {"sampling_rate": 16000, "fft_size": 1024, "hop_size": 256,
         "num_mels": 80, "fmin": 80, "fmax": 7600},
    )
    secs = 0.5 if SMOKE else 3.8
    audio = (0.1 * rng.standard_normal(int(16000 * secs))).astype(np.float32)
    out = conv(audio)  # compile the convert jit (and some synth bucket)
    in_secs = len(audio) / 16000.0

    # Random-init durations make the predicted output length arbitrary, so
    # time the two stages at DETERMINISTIC shapes for a 1:1-rhythm workload:
    # the convert jit at the input bucket and the synthesis jit over an
    # input-length mel. Chained + fetch-verified.
    n_true = 1 + len(audio) // 256
    n_padded = ((n_true + 127) // 128) * 128
    x = np.pad(audio, (512, 512), mode="reflect")
    target_len = 1024 + (n_padded - 1) * 256
    x = np.pad(x, (0, max(0, target_len - len(x))))[:target_len]
    fn = conv._get_fn(n_padded, 2 * n_padded + 8)
    synth = conv._get_synth_fn(n_padded)
    import jax.numpy as jnp

    x_d = jnp.asarray(x)
    feats, _ = fn(params, x_d, jnp.asarray(n_true, np.int32), jax.random.PRNGKey(0))
    wav = synth(vparams, feats[:n_padded])
    _ = np.asarray(wav)  # compile + settle
    n_iter = _iters(30)
    rtfs = []
    for _pass in range(N_PASSES):
        t0 = time.time()
        for i in range(n_iter):
            feats, _ = fn(
                params, x_d + 1e-9 * wav[0], jnp.asarray(n_true, np.int32),
                jax.random.PRNGKey(i),
            )
            wav = synth(vparams, feats[:n_padded])
        _ = np.asarray(wav)  # terminal host fetch
        dt = (time.time() - t0) / n_iter
        rtfs.append(dt / in_secs)
    return median_of(rtfs)


def main():
    from seq2seq_vc_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    # hardware RNG (the training default — bin/vc_train.py): threefry mask
    # generation alone costs ~37 ms of the 80 ms train step
    jax.config.update("jax_default_prng_impl", "rbg")

    probe_ms = probe_dispatch_ms(jax, jnp)
    nar_rates = bench_nar_inference(jax, jnp)
    nar_fps = median_of(nar_rates)
    train = bench_train_step(jax, jnp)
    vtn_ms = bench_vtn_train_step(jax, jnp)
    tts_ms = bench_tts_train_step(jax, jnp)
    gan = bench_gan_finetune_step(jax, jnp)
    ar_fps = bench_ar_decode(jax, jnp)
    w2w_rtf = bench_wav2wav(jax, jnp)

    extra = dict(train)
    extra["nar_mel_frames_per_sec"] = round(nar_fps, 1)
    extra["nar_vs_rtf_target"] = round(nar_fps / 3125.0, 2)
    extra["vtn_train_step_ms"] = vtn_ms
    extra["tts_train_step_ms"] = tts_ms
    extra.update(gan)
    extra["ar_decode_mel_frames_per_sec"] = round(ar_fps, 1)
    extra["wav2wav_rtf_single_stream"] = round(w2w_rtf, 4)
    # the headline IS the stable comparator now (VERDICT r4 #4): the NAR
    # inference number swings +/-13% with tunnel conditions on identical
    # code, the train step holds within ~1 ms across rounds
    extra["stable_comparator"] = "value (train_step_ms)"
    print(
        json.dumps(
            {
                "metric": "aasvc_train_step_ms_b16x512_bf16",
                "value": train["train_step_ms"],
                "unit": "ms/step (lower is better)",
                # north star: wav->wav RTF <= 0.02/chip (>1 beats it);
                # dispatch-latency sensitive — same-day comparisons only
                "vs_baseline": round(0.02 / w2w_rtf, 2),
                "dispersion": {
                    "train_step_ms": train["train_step_ms_dispersion"],
                    "nar_mel_frames_per_sec": dispersion(nar_rates),
                    "tunnel_probe_dispatch_ms": probe_ms,
                },
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()

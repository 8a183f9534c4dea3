#!/usr/bin/env python3
"""Diagnose WHERE the step-0 cross-framework gradient difference lives.

For the e2e-parity envelope model (scripts/e2e_parity.py), computes the
total-loss gradient at identical converted params on the identical batch
three ways:

  - torch fp32  (what the reference trains with)
  - jax fp32    (what this framework trains with)
  - torch fp64  (the arbiter: ~exact math)

and prints, per parameter tensor, rms(gT32-gJ32)/rms(g64) alongside each
framework's own deviation from the fp64 arbiter. A leaf where jax-vs-f64
is much larger than torch-vs-f64 is a REAL gradient parity defect; leaves
where both deviate equally at ~1e-7..1e-6 are pure rounding.

Run relay-free: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/diag_grad_parity.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import torch  # noqa: E402

from e2e_parity import (  # noqa: E402
    FS,
    LAMBDA_ALIGN,
    NMELS,
    extract_features,
    fit_stats,
    model_cfg,
    ref_total_loss,
)
from make_synth_corpus import make_corpus  # noqa: E402

from seq2seq_vc_tpu.convert import convert_aasvc  # noqa: E402
from seq2seq_vc_tpu.losses import get_criterion  # noqa: E402
from seq2seq_vc_tpu.models import AASVC  # noqa: E402
from seq2seq_vc_tpu.ops.forward_sum import (  # noqa: E402
    beta_binomial_prior,
    forward_sum_loss,
)

from seq2seq_vc.losses.duration_predictor_loss import (  # noqa: E402
    DurationPredictorLoss,
)
from seq2seq_vc.losses.forward_sum_loss import ForwardSumLoss  # noqa: E402
from seq2seq_vc.losses.l1_loss import L1Loss  # noqa: E402
from seq2seq_vc.models.aas_vc import AASVC as RefAASVC  # noqa: E402


def main():
    workdir = "/tmp/diag_grad_parity"
    os.makedirs(workdir, exist_ok=True)
    scps = make_corpus(workdir, n_utts=6, sr=FS)
    src = extract_features(scps["src"])
    trg = extract_features(scps["trg"])
    utts = sorted(src)
    train_utts = utts[:-2]
    src_st, trg_st = fit_stats(src, train_utts), fit_stats(trg, train_utts)
    nsrc = {u: ((v - src_st.mean) / src_st.scale).astype(np.float32)
            for u, v in src.items()}
    ntrg = {u: ((v - trg_st.mean) / trg_st.scale).astype(np.float32)
            for u, v in trg.items()}

    cfg = model_cfg(NMELS, NMELS)
    u = train_utts[0]
    xs, ys = nsrc[u][None], ntrg[u][None]
    ilens, olens = np.array([xs.shape[1]]), np.array([ys.shape[1]])
    prior = np.asarray(beta_binomial_prior(
        jnp.asarray(ilens), jnp.asarray(olens), xs.shape[1], ys.shape[1],
    ))

    torch.manual_seed(0)
    ref = RefAASVC(**cfg)
    ref.train()
    crit = {"L1": L1Loss(), "FS": ForwardSumLoss(cache_prior=False),
            "DP": DurationPredictorLoss()}

    ours = AASVC(**cfg)
    variables = convert_aasvc(ref.state_dict(), ours)

    l1_crit = get_criterion("L1Loss")
    dur_crit = get_criterion("DurationPredictorLoss")

    def loss_fn(params, xs, ilens, ys, olens, prior):
        out = ours.apply(
            params, xs, ilens, ys, olens, deterministic=True,
            rngs={"noise": jax.random.PRNGKey(0)},
        )
        l1 = l1_crit(out["after_outs"], out["before_outs"], out["ys"],
                     out["olens"])
        fsum = forward_sum_loss(
            out["log_p_attn"] + prior, out["ilens"], out["olens_reduced"]
        )
        dur = dur_crit(out["d_outs"], out["ds"], out["ilens"])
        return l1 + LAMBDA_ALIGN * (fsum + out["bin_loss"]) + dur

    # torch fp32 grads
    ref.zero_grad()
    total32 = ref_total_loss(ref, crit, xs, ilens, ys, olens)
    total32.backward()
    g32_sd = {n: (torch.zeros_like(p) if p.grad is None else p.grad.clone())
              for n, p in ref.named_parameters()}

    # torch fp64 arbiter grads (same params, double precision). Default
    # dtype must be f64 too: the length regulator creates internal arange
    # tensors at the default dtype.
    torch.set_default_dtype(torch.float64)
    ref64 = RefAASVC(**cfg)
    ref64.load_state_dict(
        {k: v.double() for k, v in ref.state_dict().items()}
    )
    ref64.train()
    ref64.zero_grad()
    ret = ref64(
        torch.from_numpy(xs).double(), torch.from_numpy(ilens),
        torch.from_numpy(ys).double(), torch.from_numpy(olens), None, None,
    )
    l1 = crit["L1"](ret["after_outs"], ret["before_outs"], ret["ys"],
                    ret["olens"])
    fsum = crit["FS"](ret["log_p_attn"], ret["ilens"], ret["olens_reduced"])
    dur = crit["DP"](ret["d_outs"], ret["ds"], ret["ilens"])
    total64 = l1 + LAMBDA_ALIGN * (fsum + ret["bin_loss"]) + dur
    total64.backward()
    g64_sd = {n: (torch.zeros_like(p) if p.grad is None else p.grad.clone())
              for n, p in ref64.named_parameters()}
    torch.set_default_dtype(torch.float32)

    # jax fp32 grads
    g_jax = jax.jit(jax.grad(loss_fn))(
        variables, jnp.asarray(xs), jnp.asarray(ilens),
        jnp.asarray(ys), jnp.asarray(olens), jnp.asarray(prior),
    )

    print(f"loss torch32={float(total32):.6f} torch64={float(total64):.6f} "
          f"jax32={float(loss_fn(variables, jnp.asarray(xs), jnp.asarray(ilens), jnp.asarray(ys), jnp.asarray(olens), jnp.asarray(prior))):.6f}")

    # convert both torch grad dicts into the jax tree, then walk with paths
    gt32 = convert_aasvc(g32_sd, ours)
    gt64 = convert_aasvc({n: v.float() for n, v in g64_sd.items()}, ours)

    flat32 = jax.tree_util.tree_flatten_with_path(gt32)[0]
    flat64 = jax.tree_util.tree_flatten_with_path(gt64)[0]
    flatj = jax.tree_util.tree_flatten_with_path(g_jax)[0]

    rows = []
    for (p32, a32), (_, a64), (pj, aj) in zip(flat32, flat64, flatj):
        name = jax.tree_util.keystr(p32)
        a32 = np.asarray(a32, np.float64)
        a64 = np.asarray(a64, np.float64)
        aj = np.asarray(aj, np.float64)
        denom = float(np.sqrt(np.mean(a64 * a64))) + 1e-30
        rows.append((
            name,
            float(np.sqrt(np.mean((a32 - aj) ** 2))) / denom,   # T32-vs-J32
            float(np.sqrt(np.mean((a32 - a64) ** 2))) / denom,  # T32-vs-f64
            float(np.sqrt(np.mean((aj - a64) ** 2))) / denom,   # J32-vs-f64
            a32.size,
        ))
    rows.sort(key=lambda r: -r[1])
    print(f"{'leaf':<72} {'T32-J32':>9} {'T32-f64':>9} {'J32-f64':>9} size")
    for name, tj, t64, j64, size in rows[:30]:
        print(f"{name:<72} {tj:9.2e} {t64:9.2e} {j64:9.2e} {size}")
    med = np.median([r[1] for r in rows])
    print(f"\nmedian T32-J32 rms ratio: {med:.2e}")
    print(f"median T32-f64: {np.median([r[2] for r in rows]):.2e}  "
          f"median J32-f64: {np.median([r[3] for r in rows]):.2e}")

    # ---- decompose by loss component -----------------------------------
    def jax_component(which):
        def fn(params):
            out = ours.apply(
                params, jnp.asarray(xs), jnp.asarray(ilens), jnp.asarray(ys),
                jnp.asarray(olens), deterministic=True,
                rngs={"noise": jax.random.PRNGKey(0)},
            )
            comps = {
                "l1": l1_crit(out["after_outs"], out["before_outs"],
                              out["ys"], out["olens"]),
                "fsum": forward_sum_loss(
                    out["log_p_attn"] + jnp.asarray(prior), out["ilens"],
                    out["olens_reduced"],
                ),
                "bin": out["bin_loss"],
                "dur": dur_crit(out["d_outs"], out["ds"], out["ilens"]),
            }
            return comps[which]
        return jax.jit(jax.value_and_grad(fn))

    def torch_component(which):
        ref.zero_grad()
        ret = ref(
            torch.from_numpy(xs), torch.from_numpy(ilens),
            torch.from_numpy(ys), torch.from_numpy(olens), None, None,
        )
        comps = {
            "l1": crit["L1"](ret["after_outs"], ret["before_outs"],
                             ret["ys"], ret["olens"]),
            "fsum": crit["FS"](ret["log_p_attn"], ret["ilens"],
                               ret["olens_reduced"]),
            "bin": ret["bin_loss"],
            "dur": crit["DP"](ret["d_outs"], ret["ds"], ret["ilens"]),
        }
        comps[which].backward()
        return float(comps[which].detach()), {
            n: (torch.zeros_like(p) if p.grad is None else p.grad.clone())
            for n, p in ref.named_parameters()
        }

    print("\nper-component grad disagreement (rms(gT-gJ)/rms(gT), "
          "worst leaf + median):")
    for which in ("l1", "fsum", "bin", "dur"):
        lt, gt_sd = torch_component(which)
        lj, gj = jax_component(which)(variables)
        gt_tree = convert_aasvc(gt_sd, ours)
        worst, worst_name, meds = 0.0, "", []
        for (pth, a), b in zip(
            jax.tree_util.tree_flatten_with_path(gt_tree)[0],
            jax.tree_util.tree_leaves(gj),
        ):
            a = np.asarray(a, np.float64)
            b = np.asarray(b, np.float64)
            ra = float(np.sqrt(np.mean(a * a)))
            if ra < 1e-12:
                continue
            r = float(np.sqrt(np.mean((a - b) ** 2))) / ra
            meds.append(r)
            if r > worst:
                worst, worst_name = r, jax.tree_util.keystr(pth)
        print(f"  {which:5s} loss T={lt:.6f} J={float(lj):.6f} "
              f"relΔ={abs(lt - float(lj)) / max(abs(lt), 1e-12):.1e} | "
              f"worst {worst:.2e} @ {worst_name} | median {np.median(meds):.2e}")


if __name__ == "__main__":
    main()

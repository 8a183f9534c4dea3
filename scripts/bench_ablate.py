"""On-chip ablation bench: NAR inference + train-step variants.

Round-3 questions (VERDICT r2 #2/#3):
- NAR drift: r1 210.5k -> r2 196.0k mel-f/s with unchanged bench code.
  Measure the current (reference-true, NEW-style rel-pos) model under both
  attention backends and the legacy style for comparison, median of 3.
- bf16 parameter streaming: does pre-casting fp32 params to bf16 once per
  step (shared by fwd+bwd) beat flax's in-layer casts?

Usage: python scripts/bench_ablate.py [--mode nar|train|all]
Prints one JSON line per variant.
"""

import argparse
import json
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_nar(jax, jnp, rel_pos_type, backend, n_pass=3, n_iter=30,
              compute_dtype="float32"):
    from seq2seq_vc_tpu.models import AASVC

    model = AASVC(
        idim=80, odim=80, adim=384, aheads=2, elayers=4, eunits=1536,
        dlayers=4, dunits=1536, postnet_layers=5, postnet_chans=256,
        post_encoder_reduction_factor=4, duration_predictor_type="stochastic",
        conformer_enc_kernel_size=15, conformer_dec_kernel_size=15,
        conformer_rel_pos_type=rel_pos_type, attention_backend=backend,
        compute_dtype=compute_dtype,
    )
    rng = np.random.default_rng(0)
    B, T = 4, 512
    src = rng.standard_normal((B, T, 80)).astype(np.float32)
    slens = np.asarray([512, 448, 384, 320], np.int32)

    def _init(s, sl, seed):
        keys = {
            "params": jax.random.PRNGKey(seed),
            "dropout": jax.random.PRNGKey(seed + 1),
            "noise": jax.random.PRNGKey(seed + 2),
        }
        return model.init(keys, s, sl, s, sl, deterministic=True)

    params = jax.jit(_init)(src, slens, 0)

    def step(p, s, sl, k):
        out = model.apply(
            p, s, sl, max_output_frames=160,
            method=AASVC.inference, rngs={"noise": k},
        )
        return s + 1e-9 * jnp.mean(out["outs"]), out["out_lens"]

    run = jax.jit(step)
    src_d = jnp.asarray(src)
    slens_d = jnp.asarray(slens)
    src_d, _ = run(params, src_d, slens_d, jax.random.PRNGKey(3))
    jax.block_until_ready(src_d)
    keys = [jax.random.PRNGKey(10 + i) for i in range(n_iter)]
    _ = np.asarray(keys[-1])
    rates = []
    for _p in range(n_pass):
        t0 = time.time()
        lens = None
        for i in range(n_iter):
            src_d, lens = run(params, src_d, slens_d, keys[i])
        frames = int(np.asarray(lens).sum())
        rates.append(frames / ((time.time() - t0) / n_iter))
    return {
        "variant": f"nar_{rel_pos_type}_{backend}_{compute_dtype}",
        "mel_frames_per_sec": round(statistics.median(rates), 1),
        "passes": [round(r, 1) for r in rates],
    }


def bench_train(jax, jnp, rel_pos_type, param_stream, n_pass=3, n_iter=20):
    import optax

    from seq2seq_vc_tpu.losses import L1Loss
    from seq2seq_vc_tpu.models import AASVC
    from seq2seq_vc_tpu.ops.forward_sum import beta_binomial_prior, forward_sum_loss

    model = AASVC(
        idim=80, odim=80, adim=384, aheads=2, elayers=4, eunits=1536,
        dlayers=4, dunits=1536, postnet_layers=5, postnet_chans=256,
        post_encoder_reduction_factor=4, duration_predictor_type="stochastic",
        conformer_enc_kernel_size=15, conformer_dec_kernel_size=15,
        compute_dtype="bfloat16", conformer_rel_pos_type=rel_pos_type,
    )
    B, T = 16, 512
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
        def loss_fn(p):
            if param_stream:
                # bf16 parameter streaming: one explicit cast shared by
                # fwd+bwd, instead of flax casting per use-site
                p = jax.tree_util.tree_map(
                    lambda x: x.astype(jnp.bfloat16)
                    if x.dtype == jnp.float32 and x.ndim >= 2 else x,
                    p,
                )
            rngs = {
                "dropout": jax.random.PRNGKey(seed),
                "noise": jax.random.PRNGKey(seed + 1),
            }
            out = model.apply(p, xs, ilens, ys, olens, deterministic=False, rngs=rngs)
            l1 = l1_loss(out["after_outs"], out["before_outs"], out["ys"], out["olens"])
            fsum = forward_sum_loss(
                out["log_p_attn"] + prior, out["ilens"], out["olens_reduced"]
            )
            return l1 + 2.0 * (fsum + out["bin_loss"]) + out["dur_nll"]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads = jax.tree_util.tree_map(
            lambda g: g.astype(jnp.float32), grads
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    fn = jax.jit(step, donate_argnums=(0, 1))
    xs_d, ys_d, lens_d, prior_d = (
        jax.device_put(xs), jax.device_put(ys), jax.device_put(lens),
        jax.device_put(np.asarray(prior)),
    )
    params, opt_state, loss = fn(params, opt_state, xs_d, lens_d, ys_d, lens_d, prior_d, 0)
    _ = float(np.asarray(loss))
    dts = []
    for _p in range(n_pass):
        t0 = time.time()
        for i in range(n_iter):
            params, opt_state, loss = fn(
                params, opt_state, xs_d, lens_d, ys_d, lens_d, prior_d, i + 1
            )
        final = float(np.asarray(loss))
        dts.append((time.time() - t0) / n_iter)
        assert np.isfinite(final)
    dt = statistics.median(dts)
    return {
        "variant": f"train_{rel_pos_type}" + ("_pstream" if param_stream else ""),
        "step_ms": round(dt * 1e3, 2),
        "passes_ms": [round(d * 1e3, 2) for d in dts],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--mode",
        default="all",
        choices=["nar", "train", "all", "nar_bf16", "nar_fused"],
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_prng_impl", "rbg")

    if args.mode == "nar_bf16":
        for dt in ("bfloat16", "float32"):
            print(
                json.dumps(bench_nar(jax, jnp, "latest", "xla", compute_dtype=dt)),
                flush=True,
            )
    if args.mode == "nar_fused":
        # round 4: does the fused rel-scores forward help or hurt NAR
        # inference? (the band was never the inference bottleneck; the
        # flash->fused fallback makes flash-conf models take this path)
        for backend in ("xla", "fused", "xla", "fused"):
            print(json.dumps(bench_nar(jax, jnp, "latest", backend)), flush=True)
    if args.mode in ("nar", "all"):
        for rel, backend in [
            ("latest", "xla"), ("latest", "flash"),
            ("legacy", "xla"), ("legacy", "flash"),
        ]:
            print(json.dumps(bench_nar(jax, jnp, rel, backend)), flush=True)
    if args.mode in ("train", "all"):
        for rel, ps in [
            ("latest", False), ("latest", True), ("legacy", False),
        ]:
            print(json.dumps(bench_train(jax, jnp, rel, ps)), flush=True)


if __name__ == "__main__":
    main()

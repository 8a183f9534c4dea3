"""Profile the full-scale AAS-VC train step on the real TPU chip.

Measures fetch-verified step time, XLA-reported FLOPs (cost_analysis), and
derived MFU, for the flagship arctic/vc2 aas_vc.melmelmel.v1 scale
(adim 384, 4+4 conformer, post-encoder reduction 4, SDP), batch 16 x 512
frames.  Component ablations (--mode) isolate where time goes:

  train      full loss + grad + adam update        (default)
  fwd        training-path forward only (no grad)
  encoder    source conformer encoder only
  decoder    decoder conformer only (pre-upsampled input)
  align      MAS + forward-sum path only

Usage: python scripts/profile_train.py [--mode train] [--iters 30]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_model(compute_dtype="float32", attention_backend="xla", remat=False):
    from seq2seq_vc_tpu.models import AASVC

    return AASVC(
        idim=80, odim=80, adim=384, aheads=2, elayers=4, eunits=1536,
        dlayers=4, dunits=1536, postnet_layers=5, postnet_chans=256,
        post_encoder_reduction_factor=4, duration_predictor_type="stochastic",
        conformer_enc_kernel_size=15, conformer_dec_kernel_size=15,
        compute_dtype=compute_dtype, attention_backend=attention_backend,
        remat_layers=remat,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="train")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--frames", type=int, default=512)
    ap.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    ap.add_argument(
        "--attn", default="xla", choices=["xla", "flash", "fused"]
    )  # fused = Pallas fused rel-scores (ops/rel_scores.py); pair with
    # S2S_REL_SCORES_BWD=xla|pallas for the backward-variant A/B
    ap.add_argument("--trace", default=None, help="jax.profiler trace output dir")
    ap.add_argument("--remat", action="store_true", help="checkpoint conformer layers")
    ap.add_argument("--prng", default=None, choices=[None, "rbg", "threefry2x32"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from seq2seq_vc_tpu.losses import L1Loss
    from seq2seq_vc_tpu.ops.forward_sum import beta_binomial_prior, forward_sum_loss

    if args.prng:
        import jax as _jax

        _jax.config.update("jax_default_prng_impl", args.prng)
    model = build_model(
        compute_dtype=args.dtype, attention_backend=args.attn, remat=args.remat
    )
    B, T = args.batch, args.frames
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
    n_params = sum(int(np.prod(v.shape)) for v in jax.tree.leaves(params))
    print(f"params: {n_params/1e6:.1f}M")

    l1_loss = L1Loss()
    pr = 4  # post_encoder_reduction_factor
    ilens_r = lens // pr
    prior = beta_binomial_prior(ilens_r, lens, T // pr, T)

    tx = optax.adamw(1e-4)
    opt_state = jax.jit(tx.init)(params)

    # move the batch to the device ONCE: passing host numpy into the timed
    # loop would re-transfer ~40MB/iter over the remote tunnel
    xs = jax.device_put(xs)
    ys = jax.device_put(ys)
    lens = jax.device_put(lens)
    prior = jax.device_put(np.asarray(prior))
    jax.block_until_ready((xs, ys, lens, prior))

    def loss_fn(params, xs, ilens, ys, olens, prior, seed):
        rngs = {
            "dropout": jax.random.PRNGKey(seed),
            "noise": jax.random.PRNGKey(seed + 1),
        }
        out = model.apply(params, xs, ilens, ys, olens, deterministic=False, rngs=rngs)
        l1 = l1_loss(out["after_outs"], out["before_outs"], out["ys"], out["olens"])
        fsum = forward_sum_loss(
            out["log_p_attn"] + prior, out["ilens"], out["olens_reduced"]
        )
        loss = l1 + 2.0 * (fsum + out["bin_loss"]) + out["dur_nll"]
        return loss

    if args.mode == "train":
        def step(params, opt_state, xs, ilens, ys, olens, prior, seed):
            loss, grads = jax.value_and_grad(loss_fn)(
                params, xs, ilens, ys, olens, prior, seed
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        fn = jax.jit(step, donate_argnums=(0, 1))

        def run_once(i, carry):
            params, opt_state = carry
            params, opt_state, loss = fn(params, opt_state, xs, lens, ys, lens, prior, i)
            return (params, opt_state), loss

        carry = (params, opt_state)
        lowered = fn.lower(params, opt_state, xs, lens, ys, lens, prior, 0)
    elif args.mode == "fwd":
        fn = jax.jit(loss_fn)

        def run_once(i, carry):
            loss = fn(carry, xs, lens, ys, lens, prior, i)
            return carry, loss

        carry = params
        lowered = fn.lower(params, xs, lens, ys, lens, prior, 0)
    elif args.mode == "encoder":
        def enc(params, xs, ilens, seed):
            rngs = {"dropout": jax.random.PRNGKey(seed)}
            hs, hlens = model.apply(
                params, xs, ilens, None, False, rngs=rngs,
                method=type(model)._encode,
            )
            return jnp.sum(hs)

        fn = jax.jit(jax.value_and_grad(enc))

        def run_once(i, carry):
            v, g = fn(carry, xs, lens, i)
            return carry, v

        carry = params
        lowered = fn.lower(params, xs, lens, 0)
    elif args.mode == "decoder":
        # decoder conformer only: pre-upsampled input at the post-encoder
        # width (adim * post_encoder_reduction_factor)
        wide = 384 * pr
        hs_up = jax.device_put(
            rng.standard_normal((B, T, wide)).astype(np.float32)
        )

        def dec(params, hs_up, olens, seed):
            rngs = {"dropout": jax.random.PRNGKey(seed)}
            from seq2seq_vc_tpu.ops import make_non_pad_mask

            masks = make_non_pad_mask(olens, hs_up.shape[1])
            zs, _ = model.apply(
                params, hs_up, masks, deterministic=False, rngs=rngs,
                method=lambda m, h, mk, **kw: m.decoder(h, mk, **kw),
            )
            return jnp.sum(zs)

        fn = jax.jit(jax.value_and_grad(dec))

        def run_once(i, carry):
            v, g = fn(carry, hs_up, lens, i)
            return carry, v

        carry = params
        lowered = fn.lower(params, hs_up, lens, 0)
    elif args.mode == "align":
        from seq2seq_vc_tpu.ops.mas import viterbi_decode

        def align(lp, ilens, olens, prior):
            ds, bin_loss = viterbi_decode(lp, ilens, olens)
            fsum = forward_sum_loss(lp + prior, ilens, olens)
            return fsum + bin_loss + 0.0 * jnp.sum(ds)

        lp0 = jnp.asarray(
            rng.standard_normal((B, T, T // pr)).astype(np.float32)
        )
        grad_fn = jax.jit(jax.value_and_grad(align))

        ilens_r_d = jax.device_put(np.asarray(ilens_r))

        def run_once(i, carry):
            v, g = grad_fn(carry, ilens_r_d, lens, prior)
            return carry + 1e-9 * g, v

        carry = lp0
        lowered = grad_fn.lower(lp0, jnp.asarray(ilens_r), lens, prior)
    else:
        raise SystemExit(f"unknown mode {args.mode}")

    compiled = lowered.compile()
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        bytes_ = float(cost.get("bytes accessed", 0.0))
    except Exception as e:  # pragma: no cover
        print("cost_analysis failed:", e)
        flops, bytes_ = 0.0, 0.0
    # HBM high-water (long-context ablations, VERDICT r4 #2): XLA's static
    # allocation plan. peak = args + outputs + temps (donation aliases args
    # onto outputs, so params/opt_state are counted once).
    mem = {}
    try:
        ma = compiled.memory_analysis()
        for k in (
            "argument_size_in_bytes", "output_size_in_bytes",
            "temp_size_in_bytes", "alias_size_in_bytes",
            "peak_memory_in_bytes",
        ):
            v = getattr(ma, k, None)
            if v is not None:
                mem[k.replace("_in_bytes", "_GB")] = round(v / 1e9, 3)
    except Exception as e:  # pragma: no cover
        print("memory_analysis failed:", e)

    # warm up / compile
    t0 = time.time()
    carry, loss = run_once(0, carry)
    loss = float(np.asarray(loss))
    print(f"compile+first step: {time.time()-t0:.1f}s  loss={loss:.3f}")

    if args.trace and jax.default_backend() not in ("cpu", "gpu", "tpu"):
        # jax.profiler trace HANGS on the axon remote runtime (no device-trace
        # support over the tunnel) and wedges the chip — refuse.
        print(
            f"--trace ignored: backend {jax.default_backend()!r} has no "
            "device-trace support (axon tunnel); profile by ablation modes instead"
        )
        args.trace = None
    if args.trace:
        with jax.profiler.trace(args.trace):
            for i in range(3):
                carry, loss = run_once(100 + i, carry)
            loss = float(np.asarray(loss))
        print("trace written to", args.trace)

    t0 = time.time()
    for i in range(args.iters):
        carry, loss = run_once(i + 1, carry)
    loss = float(np.asarray(loss))  # terminal host fetch: fetch-verified
    dt = (time.time() - t0) / args.iters
    # v5p ~459 TF/s bf16, ~229.5 fp32... report vs 197 TF/s (v4 bf16) and raw
    peak_bf16 = 275e12  # conservative single-chip bf16 peak (v5e=394, v4=275, v3=123)
    mfu = flops / dt / peak_bf16 if flops else 0.0
    frames = int(lens.sum())
    print(json.dumps({
        "mode": args.mode,
        "dtype": args.dtype,
        "attn": args.attn,
        "remat": args.remat,
        "prng": args.prng or "default",
        "step_ms": round(dt * 1e3, 2),
        "loss": round(loss, 4),
        "flops_G": round(flops / 1e9, 1),
        "tflops_per_s": round(flops / dt / 1e12, 2),
        "mfu_vs_275T": round(mfu, 4),
        "hbm_GB": round(bytes_ / 1e9, 2),
        "hbm_GBps": round(bytes_ / dt / 1e9, 1),
        "mel_frames_per_s": round(frames / dt, 1),
        "mem": mem,
    }))


if __name__ == "__main__":
    main()

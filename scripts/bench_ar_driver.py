"""A/B the AR decode host loops on the real chip: fixed-chunk sequential
(round-2 vc_decode pattern) vs ChunkedARDecoder (geometric + speculative,
round-3) at the bench VTN scale, with and without early stopping.

Run on a QUIET host (no other python processes). First compile over the
tunnel is slow; all variants share the persistent compilation cache.

    python scripts/bench_ar_driver.py [--passes 3] [--iters 4]
"""

import argparse
import statistics
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    from seq2seq_vc_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from seq2seq_vc_tpu.models import VTN
    from seq2seq_vc_tpu.models.ar_driver import ChunkedARDecoder

    model = VTN(
        idim=80, odim=80, adim=384, aheads=4, elayers=6, eunits=1536,
        dlayers=6, dunits=1536, postnet_layers=5, postnet_chans=256,
        decoder_reduction_factor=4,
    )
    rng = np.random.default_rng(0)
    B, T = 4, 256
    src = rng.standard_normal((B, T, 80)).astype(np.float32)
    slens = np.asarray([256, 224, 192, 160], np.int32)
    labels = np.zeros((B, T), np.float32)

    def _init(s, sl, lab, seed):
        keys = {
            "params": jax.random.PRNGKey(seed),
            "dropout": jax.random.PRNGKey(seed + 1),
        }
        return model.init(keys, s, sl, s, lab, sl, deterministic=True)

    params = jax.jit(_init)(src, slens, labels, 0)
    src_d, slens_d = jnp.asarray(src), jnp.asarray(slens)
    maxr = 4.0

    def timed(fn, label):
        out = fn(0)  # compile
        jax.block_until_ready(out["outs"])
        rates = []
        for _ in range(args.passes):
            t0 = time.time()
            acc = 0.0
            for it in range(args.iters):
                out = fn(it)
                acc += float(np.asarray(out["outs"]).mean())
            dt = time.time() - t0
            assert np.isfinite(acc)
            frames = out["outs"].shape[1] * B * args.iters
            rates.append(frames / dt)
        med = statistics.median(rates)
        print(f"{label}: {med:,.0f} frames/s (passes: "
              + ", ".join(f"{r:,.0f}" for r in rates) + ")")
        return med

    # --- round-2 pattern: fixed 32-step chunks, blocking fetch per chunk
    chunk = 32
    init_jit = jax.jit(lambda p, s, sl, seed: model.apply(
        p, s, sl, jax.random.PRNGKey(seed), maxr, method=VTN.decode_init))
    chunk_jit = jax.jit(lambda p, st, t0: model.apply(
        p, st, t0, chunk, 1.1, 0.0, maxr, method=VTN.decode_chunk))
    post_jit = jax.jit(lambda p, o: model.apply(
        p, o, method=VTN.decode_postnet))

    def fixed_loop(seed):
        st = init_jit(params, src_d, slens_d, seed)
        maxlen = int(st["cache"]["k"].shape[3])
        outs_c = []
        t0 = 0
        while t0 < maxlen:
            st, outs, probs, att = chunk_jit(params, st, t0)
            outs_c.append(outs)
            t0 += chunk
            if bool(np.asarray(st["finished"]).all()):
                break
        o = jnp.concatenate(outs_c, axis=1)
        return {"outs": post_jit(params, o)}

    # --- round-3 driver (threshold 1.1 = never stops: pure dispatch cost)
    drv = ChunkedARDecoder(model, VTN, threshold=1.1, maxlenratio=maxr,
                           base_chunk=32, max_chunk=256)

    def driver_loop(seed):
        return drv(params, src_d, slens_d, jax.random.PRNGKey(seed))

    # --- driver with expected-length first dispatch
    def driver_est(seed):
        return drv(params, src_d, slens_d, jax.random.PRNGKey(seed),
                   est_steps=int(1.2 * T / 4))

    a = timed(fixed_loop, "fixed-chunk loop (r2)")
    b = timed(driver_loop, "geometric driver (r3)")
    c = timed(driver_est, "geometric driver + est-first")
    print(f"driver speedup vs fixed: {b / a:.2f}x; est-first: {c / a:.2f}x")


if __name__ == "__main__":
    main()

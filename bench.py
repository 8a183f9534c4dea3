"""Benchmark: flagship AAS-VC NAR conversion throughput on one chip.

Prints ONE JSON line: mel-frames/sec/chip for the full-size AAS-VC
(arctic vc2 config scale: adim 384, 4+4 conformer layers, post-encoder
reduction 4, stochastic duration predictor) converting a batch of
~8-second utterances, including on-device duration prediction, Gaussian
upsampling, decoding, and postnet.

``vs_baseline``: the BASELINE.md north-star is wav->wav RTF <= 0.02/chip;
at hop 256 / 16 kHz one second of speech is 62.5 mel frames, so RTF 0.02
corresponds to 3125 mel-frames/sec. vs_baseline = value / 3125 (>1 beats
the target).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from seq2seq_vc_tpu.models import AASVC

    model = AASVC(
        idim=80, odim=80, adim=384, aheads=2, elayers=4, eunits=1536,
        dlayers=4, dunits=1536, postnet_layers=5, postnet_chans=256,
        post_encoder_reduction_factor=4, duration_predictor_type="stochastic",
        conformer_enc_kernel_size=15, conformer_dec_kernel_size=15,
    )
    rng = np.random.default_rng(0)
    B, T = 4, 512
    # keep host numpy here; pass into jit as arguments (closure-captured
    # device arrays stall MLIR lowering over the remote TPU tunnel)
    src = rng.standard_normal((B, T, 80)).astype(np.float32)
    slens = np.asarray([512, 448, 384, 320], np.int32)
    tgt = rng.standard_normal((B, T, 80)).astype(np.float32)
    tlens = np.asarray([512, 448, 384, 320], np.int32)
    def _init(s, sl, t, tl, seed):
        keys = {
            "params": jax.random.PRNGKey(seed),
            "dropout": jax.random.PRNGKey(seed + 1),
            "noise": jax.random.PRNGKey(seed + 2),
        }
        return model.init(keys, s, sl, t, tl, deterministic=True)

    params = jax.jit(_init)(src, slens, tgt, tlens, 0)

    # chained protocol: iteration i+1's input depends on iteration i's full
    # output, so executions cannot overlap or be elided by the async runtime;
    # host round trips stay out of the timed loop
    def step(p, s, sl, k):
        out = model.apply(
            p, s, sl, max_output_frames=160,
            method=AASVC.inference, rngs={"noise": k},
        )
        s_next = s + 1e-9 * jnp.mean(out["outs"])
        return s_next, out["out_lens"]

    run = jax.jit(step)
    src_d = jnp.asarray(src)
    slens_d = jnp.asarray(slens)
    src_d, _ = run(params, src_d, slens_d, jax.random.PRNGKey(3))
    jax.block_until_ready(src_d)  # compile

    n_iter = 60
    keys = [jax.random.PRNGKey(10 + i) for i in range(n_iter)]
    _ = np.asarray(keys[-1])  # force key materialization
    # fetch-verified timing: the final np.asarray host fetch cannot complete
    # until every chained execution has actually run (block_until_ready alone
    # can return early on asynchronous runtimes with deep dispatch queues)
    t0 = time.time()
    lens = None
    for i in range(n_iter):
        src_d, lens = run(params, src_d, slens_d, keys[i])
    frames_per_call = int(np.asarray(lens).sum())
    dt = (time.time() - t0) / n_iter
    frames = frames_per_call
    fps = frames / dt
    print(
        json.dumps(
            {
                "metric": "aasvc_nar_inference_mel_frames_per_sec_per_chip",
                "value": round(fps, 1),
                "unit": "mel-frames/sec",
                "vs_baseline": round(fps / 3125.0, 2),
            }
        )
    )


if __name__ == "__main__":
    main()

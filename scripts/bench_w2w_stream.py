"""A/B the AR wav2wav pipeline on the real chip: serial (decode to
completion, then postnet+synthesis) vs streamed (speculative
postnet+synthesis dispatched during the chunked decode — VERDICT r3 #3).

Bench-scale VTN + HiFi-GAN, single-stream (the serving case). Both
variants are fetch-verified end-to-end: convert_batch returns host numpy.

Run on a QUIET host:  python scripts/bench_w2w_stream.py [--passes 5]
"""

import argparse
import statistics
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=5)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--secs", type=float, default=3.8)
    ap.add_argument("--threshold", type=float, default=0.5,
                    help="0.5 = production early-stop serving shape (the "
                    "overlap's target case); 1.1 = full-budget decode "
                    "(isolates tail overlap, speculations mostly dead)")
    args = ap.parse_args()

    from seq2seq_vc_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import numpy as np

    from seq2seq_vc_tpu.models import VTN
    from seq2seq_vc_tpu.pipeline import Wav2WavARConverter
    from seq2seq_vc_tpu.vocoder.hifigan import HifiganGenerator

    model = VTN(
        idim=80, odim=80, adim=384, aheads=4, elayers=6, eunits=1536,
        dlayers=6, dunits=1536, postnet_layers=5, postnet_chans=256,
        decoder_reduction_factor=4,
    )
    voc = HifiganGenerator(
        in_channels=80, upsample_factors=(8, 8, 2, 2),
        upsample_kernel_sizes=(16, 16, 4, 4),
    )
    rng = np.random.default_rng(0)
    sr = 16000
    dummy = rng.standard_normal((1, 64, 80)).astype(np.float32)
    lens = np.asarray([64], np.int32)
    labels = np.zeros((1, 64), np.float32)
    keys = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    mp = jax.jit(
        lambda m, l, lab: model.init(keys, m, l, m, lab, l, deterministic=True)
    )(dummy, lens, labels)
    vp = jax.jit(lambda m: voc.init(jax.random.PRNGKey(3), m))(dummy)
    print("params ready", flush=True)

    stats = {"mean": np.zeros(80, np.float32), "scale": np.ones(80, np.float32)}
    config = {
        "sampling_rate": sr, "fft_size": 1024, "hop_size": 256,
        "num_mels": 80, "fmin": 80, "fmax": 7600,
        "model_params": {"decoder_reduction_factor": 4},
        "inference": {"threshold": args.threshold, "maxlenratio": 4.0,
                      "decode_chunk_steps": 32, "decode_max_chunk_steps": 256,
                      "decode_est_len_ratio": 1.2},
    }
    conv = Wav2WavARConverter(model, mp, voc, vp, stats, stats, config)

    audio = (0.1 * rng.standard_normal(int(sr * args.secs))).astype(np.float32)
    in_secs = len(audio) / sr

    results = {}
    for label, stream in (("serial", False), ("streamed", True)):
        y = conv(audio, rng=jax.random.PRNGKey(0), stream_vocoder=stream)
        print(f"{label}: warm, wav {y.shape}", flush=True)
        rtfs = []
        for _ in range(args.passes):
            t0 = time.time()
            for i in range(args.iters):
                y = conv(audio, rng=jax.random.PRNGKey(i), stream_vocoder=stream)
            dt = (time.time() - t0) / args.iters
            rtfs.append(dt / in_secs)
        med = statistics.median(rtfs)
        results[label] = med
        print(
            f"{label}: rtf median {med:.5f} (min {min(rtfs):.5f} "
            f"max {max(rtfs):.5f})", flush=True,
        )

    # outputs must match (same speculation math; final-tail halo excluded)
    ys = conv(audio, rng=jax.random.PRNGKey(0), stream_vocoder=False)
    yt = conv(audio, rng=jax.random.PRNGKey(0), stream_vocoder=True)
    n_safe = max(0, len(ys) - 9 * 256)
    err = float(np.abs(ys[:n_safe] - yt[:n_safe]).max()) if n_safe else 0.0
    print(
        f"match: len {len(ys)}=={len(yt)} maxerr(interior)={err:.2e} | "
        f"speedup {results['serial'] / results['streamed']:.3f}x",
        flush=True,
    )


if __name__ == "__main__":
    main()

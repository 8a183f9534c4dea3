"""On-chip load characterization of vc_serve (VERDICT r4 weak #3).

Measures the production serving surface under concurrent clients: req/s and
p50/p95 latency at 1/4/16 concurrent streams, micro-batching on vs off, for
both hosted families (AASVC single-jit NAR pipeline, VTN chunked AR
pipeline), plus an under-load `--max-idle-seconds` drain check.

Three-process discipline (CLAUDE.md TPU rules): the SERVER is the one TPU
process; fixture building runs in a relay-free CPU subprocess
(PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu); this orchestrator itself never
imports jax — it only spawns subprocesses and drives TCP sockets, so it
cannot contend for the relay grant.

Usage (quiet host):
  python scripts/bench_serve_load.py --workdir /tmp/serve_load \
      [--platform tpu] [--n-req 48] [--secs 3.0]

Fixture scale is the flagship arctic vc2 / vc1 conf (adim 384, 4+4 conformer
AASVC, 6+6 transformer VTN, full 80-mel HiFi-GAN V1) with random-init
weights — timing only; the compute is identical to a trained checkpoint.
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import statistics
import struct
import subprocess
import sys
import threading
import time
import wave

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FIXTURE_CODE = r"""
import os, sys, yaml
import numpy as np
sys.path.insert(0, {repo!r})
import jax
import flax
from seq2seq_vc_tpu.core.checkpoint import save_checkpoint
from seq2seq_vc_tpu.models import AASVC, VTN
from seq2seq_vc_tpu.utils.io import write_hdf5
from seq2seq_vc_tpu.vocoder.hifigan import HifiganGenerator

out = {out!r}
os.makedirs(out, exist_ok=True)
feat = dict(sampling_rate=16000, fft_size=1024, hop_size=256, num_mels=80,
            fmin=80, fmax=7600)

# ---- AASVC (NAR flagship, arctic vc2 conf scale) ----
nar_params = dict(
    idim=80, odim=80, adim=384, aheads=2, elayers=4, eunits=1536,
    dlayers=4, dunits=1536, postnet_layers=5, postnet_chans=256,
    post_encoder_reduction_factor=4, duration_predictor_type="stochastic",
    conformer_enc_kernel_size=15, conformer_dec_kernel_size=15,
    attention_backend="fused",
)
nar_dir = os.path.join(out, "nar"); os.makedirs(nar_dir, exist_ok=True)
cfg = dict(feat, model_type="AASVC", model_params=nar_params)
with open(os.path.join(nar_dir, "config.yml"), "w") as f:
    yaml.safe_dump(cfg, f)
model = AASVC(**nar_params)
keys = {{"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
        "noise": jax.random.PRNGKey(2)}}
x = np.zeros((1, 64, 80), np.float32); l = np.asarray([64])
mp = jax.jit(lambda: model.init(keys, x, l, x, l, deterministic=True))()
save_checkpoint(os.path.join(nar_dir, "checkpoint-1steps.ckpt"), mp, {{}}, 1, 1)

# ---- VTN (AR flagship, arctic vc1 conf scale) ----
ar_params = dict(
    idim=80, odim=80, adim=384, aheads=4, elayers=6, eunits=1536,
    dlayers=6, dunits=1536, postnet_layers=5, postnet_chans=256,
    decoder_reduction_factor=4,
)
ar_dir = os.path.join(out, "ar"); os.makedirs(ar_dir, exist_ok=True)
cfg = dict(feat, model_type="VTN", model_params=ar_params,
           inference=dict(threshold=0.5, maxlenratio=2.0, minlenratio=0.2,
                          decode_chunk_steps=32, decode_max_chunk_steps=256))
with open(os.path.join(ar_dir, "config.yml"), "w") as f:
    yaml.safe_dump(cfg, f)
model = VTN(**ar_params)
keys = {{"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}}
lab = np.zeros((1, 64), np.float32)
xs = np.zeros((1, 64, 80), np.float32)
mp = jax.jit(lambda: model.init(keys, xs, np.asarray([64]), xs, lab,
                                np.asarray([64]), deterministic=True))()
save_checkpoint(os.path.join(ar_dir, "checkpoint-1steps.ckpt"), mp, {{}}, 1, 1)

# ---- stats + full-scale HiFi-GAN V1 vocoder ----
stats = os.path.join(out, "stats.h5")
write_hdf5(stats, "mel_mean", np.zeros(80, np.float32))
write_hdf5(stats, "mel_scale", np.ones(80, np.float32))
gen_cfg = dict(in_channels=80, upsample_factors=(8, 8, 2, 2),
               upsample_kernel_sizes=(16, 16, 4, 4))
voc = HifiganGenerator(**gen_cfg)
vp = jax.jit(lambda: voc.init(jax.random.PRNGKey(3),
                              np.zeros((1, 64, 80), np.float32)))()
with open(os.path.join(out, "voc.ckpt"), "wb") as f:
    f.write(flax.serialization.msgpack_serialize(
        jax.tree_util.tree_map(np.asarray, vp)))
with open(os.path.join(out, "voc.yml"), "w") as f:
    yaml.safe_dump({{"generator_params": {{
        k: (list(v) if isinstance(v, tuple) else v)
        for k, v in gen_cfg.items()}}}}, f)
print("fixtures ready:", out)
"""


def write_wav(path, x, sr=16000):
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        ints = [max(-32767, min(32767, int(v * 32767))) for v in x]
        w.writeframes(struct.pack(f"<{len(ints)}h", *ints))


def make_inputs(workdir, secs, n=4, sr=16000):
    import random

    rnd = random.Random(0)
    paths = []
    for i in range(n):
        x = [0.1 * (rnd.random() * 2 - 1) for _ in range(int(sr * secs))]
        p = os.path.join(workdir, f"in_{i}.wav")
        write_wav(p, x, sr)
        paths.append(p)
    return paths


def build_fixtures(workdir):
    code = FIXTURE_CODE.format(repo=REPO, out=os.path.join(workdir, "fx"))
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    subprocess.run([sys.executable, "-c", code], env=env, check=True,
                   timeout=1200)


def start_server(workdir, family, max_batch, platform, warmup_secs,
                 max_idle=0.0):
    fx = os.path.join(workdir, "fx")
    mdir = os.path.join(fx, "nar" if family == "nar" else "ar")
    cmd = [
        sys.executable, "-m", "seq2seq_vc_tpu.bin.vc_serve",
        "--checkpoint", os.path.join(mdir, "checkpoint-1steps.ckpt"),
        "--src-stats", os.path.join(fx, "stats.h5"),
        "--trg-stats", os.path.join(fx, "stats.h5"),
        "--vocoder-checkpoint", os.path.join(fx, "voc.ckpt"),
        "--vocoder-config", os.path.join(fx, "voc.yml"),
        "--port", "0", "--warmup-seconds", warmup_secs,
        "--max-batch", str(max_batch),
    ]
    if max_idle:
        cmd += ["--max-idle-seconds", str(max_idle)]
    env = dict(os.environ)
    if platform == "cpu":
        env.update(PALLAS_AXON_POOL_IPS="", S2S_JAX_PLATFORM="cpu")
    proc = subprocess.Popen(
        cmd, cwd=REPO, env=env, stdout=subprocess.PIPE,
        stderr=open(os.path.join(workdir, f"serve_{family}_mb{max_batch}.log"),
                    "w"),
        text=True,
    )
    line = proc.stdout.readline()  # blocks until warmup done + ready
    info = json.loads(line)
    assert info.get("ready") and info.get("port"), info
    return proc, info["port"]


def one_request(port, in_path, out_path, timeout=600.0):
    t0 = time.time()
    with socket.create_connection(("127.0.0.1", port), timeout=timeout) as s:
        s.sendall(f"{in_path} {out_path}\n".encode())
        buf = b""
        while not buf.endswith(b"\n"):
            chunk = s.recv(65536)
            if not chunk:
                break
            buf += chunk
    rep = json.loads(buf.decode())
    rep["client_ms"] = (time.time() - t0) * 1e3
    return rep


def run_load(port, inputs, outdir, concurrency, n_req):
    """Closed-loop load: `concurrency` worker threads, each issuing its next
    request as soon as the previous reply lands, n_req total."""
    results = []
    lock = threading.Lock()
    counter = iter(range(n_req))

    def worker(wid):
        while True:
            with lock:
                i = next(counter, None)
            if i is None:
                return
            rep = one_request(
                port, inputs[i % len(inputs)],
                os.path.join(outdir, f"out_c{concurrency}_{i}.wav"),
            )
            with lock:
                results.append(rep)

    t0 = time.time()
    threads = [threading.Thread(target=worker, args=(w,))
               for w in range(concurrency)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0
    ok = [r for r in results if r.get("ok")]
    lats = sorted(r["client_ms"] for r in ok)
    if not lats:
        return {"concurrency": concurrency, "error": results[:2]}
    q = lambda p: lats[min(len(lats) - 1, int(p * len(lats)))]
    return {
        "concurrency": concurrency,
        "n_ok": len(ok),
        "n_err": len(results) - len(ok),
        "req_per_s": round(len(ok) / wall, 3),
        "lat_ms": {"p50": round(q(0.50), 1), "p95": round(q(0.95), 1),
                   "mean": round(statistics.mean(lats), 1)},
        "mean_batch": round(statistics.mean(r["batch"] for r in ok), 2),
        "rtf_p50": round(statistics.median(r["rtf"] for r in ok), 4),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/serve_load")
    ap.add_argument("--platform", default="tpu", choices=["tpu", "cpu"])
    ap.add_argument("--n-req", type=int, default=48)
    ap.add_argument("--secs", type=float, default=3.0)
    ap.add_argument("--concurrency", default="1,4,16")
    ap.add_argument("--families", default="nar,ar")
    ap.add_argument("--skip-fixtures", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    outdir = os.path.join(args.workdir, "out")
    os.makedirs(outdir, exist_ok=True)
    if not args.skip_fixtures:
        print("[serve_load] building fixtures (CPU, relay-free)", flush=True)
        build_fixtures(args.workdir)
    inputs = make_inputs(args.workdir, args.secs)
    conc = [int(c) for c in args.concurrency.split(",")]
    warm = str(args.secs)

    all_rows = []
    for family in args.families.split(","):
        # micro-batch on/off; AR serves too (convert_batch pads the batch)
        for mb in ((1, 16) if family == "nar" else (1, 4)):
            label = f"{family}_mb{mb}"
            print(f"[serve_load] starting server {label} (compiling...)",
                  flush=True)
            t0 = time.time()
            proc, port = start_server(
                args.workdir, family, mb, args.platform, warm,
                max_idle=45.0,
            )
            print(f"[serve_load] {label} ready on :{port} "
                  f"({time.time()-t0:.0f}s startup)", flush=True)
            try:
                for c in conc:
                    n_req = args.n_req if family == "nar" else max(
                        8, args.n_req // 4
                    )  # AR decodes are ~20x slower; keep the matrix bounded
                    row = dict(run_load(port, inputs, outdir, c, n_req),
                               family=family, max_batch=mb)
                    all_rows.append(row)
                    print(json.dumps(row), flush=True)
                # drain-under-idle check: server exits by itself via
                # --max-idle-seconds while we hold no connection
                t0 = time.time()
                rc = proc.wait(timeout=120)
                all_rows.append({
                    "family": family, "max_batch": mb,
                    "idle_drain_ok": rc == 0,
                    "idle_drain_s": round(time.time() - t0, 1),
                })
                print(json.dumps(all_rows[-1]), flush=True)
            finally:
                if proc.poll() is None:
                    proc.terminate()
                    proc.wait(timeout=120)
            time.sleep(5)  # let the relay settle between server processes
    if args.out:
        with open(args.out, "w") as f:
            json.dump(all_rows, f, indent=1)
        print(f"[serve_load] wrote {args.out}")


if __name__ == "__main__":
    main()

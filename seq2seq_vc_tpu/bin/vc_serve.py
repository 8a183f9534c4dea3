"""Warm wav->wav conversion server (single-jit pipeline, persistent process).

Beyond-reference production surface. The reference converts offline by
chaining five file-based processes (feature extraction -> normalize ->
``bin/vc_decode.py`` -> vocoder -> wav), paying model load + CUDA init per
invocation. On TPU the economics are inverted: compilation dominates
(minutes over a remote-compile tunnel) while a warm conversion is
milliseconds — so the production deployment is a resident process that
compiles each length bucket once and serves every subsequent request from
the jit cache (``pipeline.Wav2WavConverter``: log-mel -> normalize ->
AAS-VC -> stat chain -> chunked HiFi-GAN as ONE compiled program).

Protocols (newline-delimited, one request per line):

- stdio (default): ``<in_wav> <out_wav>`` on stdin; a JSON result line per
  request on stdout. Empty line or EOF ends the session.
- TCP (``--port N``): same line protocol per connection
  (``printf 'in.wav out.wav\\n' | nc host N``). Device access is
  serialized with a lock — one TPU program at a time, any number of
  client connections.

Warmup (``--warmup-seconds``) pre-compiles the named duration buckets at
startup so first requests don't pay the compile.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
import threading
import time

import numpy as np


def build_converter(args):
    """Load checkpoint/config/stats/vocoder into a Wav2WavConverter."""
    import jax

    from ..core.checkpoint import load_checkpoint
    from ..core.config import load_config
    from ..models import get_model_class
    from ..pipeline import Wav2WavConverter
    from ..utils.io import read_hdf5
    from ..vocoder.hifigan import load_hifigan_model
    from .vc_train import init_model_params

    config_path = args.config or os.path.join(
        os.path.dirname(args.checkpoint), "config.yml"
    )
    config = load_config(config_path)
    model_type = config["model_type"]
    if model_type != "AASVC":
        raise NotImplementedError(
            f"vc_serve drives the single-jit NAR pipeline (AASVC); got "
            f"{model_type!r} — use bin/vc_decode for AR models"
        )
    model = get_model_class(model_type)(**config["model_params"])

    d = config["model_params"]["idim"]
    dummy = {
        "xs": np.zeros((1, 64, d), np.float32),
        "ilens": np.asarray([64], np.int32),
        "ys": np.zeros((1, 64, config["model_params"]["odim"]), np.float32),
        "olens": np.asarray([64], np.int32),
        "dp_inputs": np.zeros((1, 64, d), np.float32),
        "dplens": np.asarray([64], np.int32),
    }
    cfg_for_init = dict(config)
    cfg_for_init["collater_type"] = config.get("collater_type", "NARVCCollater")
    params = init_model_params(model, cfg_for_init, dummy)
    params = load_checkpoint(args.checkpoint, params)["model"]
    logging.info("restored model from %s", args.checkpoint)

    feat = args.feat_type

    def stats_from(path):
        return {
            "mean": np.asarray(read_hdf5(path, f"{feat}_mean"), np.float32),
            "scale": np.asarray(read_hdf5(path, f"{feat}_scale"), np.float32),
        }

    src_stats = stats_from(args.src_stats)
    trg_stats = stats_from(args.trg_stats)
    vocoder_stats = None
    if args.vocoder_stats:
        vocoder_stats = {
            "mean": np.asarray(read_hdf5(args.vocoder_stats, "mean"), np.float32),
            "scale": np.asarray(read_hdf5(args.vocoder_stats, "scale"), np.float32),
        }

    voc, vparams = load_hifigan_model(args.vocoder_checkpoint, args.vocoder_config)
    logging.info("restored vocoder from %s", args.vocoder_checkpoint)

    del jax  # converter manages its own jits
    return Wav2WavConverter(
        model, params, voc, vparams, src_stats, trg_stats, config,
        vocoder_stats=vocoder_stats, bucket_frames=args.bucket_frames,
    )


class ConversionService:
    """Thread-safe wrapper: one TPU program in flight at a time."""

    def __init__(self, converter, sr: int):
        self.converter = converter
        self.sr = sr
        self._lock = threading.Lock()
        self._n = 0

    def warmup(self, seconds):
        for s in seconds:
            t0 = time.time()
            self.converter(np.zeros(int(self.sr * s), np.float32))
            logging.info("warmup %.1fs bucket: %.1fs", s, time.time() - t0)

    def convert_file(self, in_path: str, out_path: str) -> dict:
        import jax

        from ..bin.preprocess import resample
        from ..utils.audio import read_wav, write_wav

        t0 = time.time()
        audio, sr = read_wav(in_path)
        if audio.ndim > 1:
            audio = audio.mean(axis=-1)
        if sr != self.sr:
            audio = resample(audio.astype(np.float32), sr, self.sr)
        in_secs = len(audio) / self.sr
        with self._lock:
            self._n += 1
            rng = jax.random.PRNGKey(self._n)
            y = self.converter(audio.astype(np.float32), rng=rng)
        write_wav(out_path, y, self.sr)
        dt = time.time() - t0
        return {
            "ok": True,
            "out": out_path,
            "input_seconds": round(in_secs, 3),
            "output_seconds": round(len(y) / self.sr, 3),
            "wall_ms": round(dt * 1e3, 1),
            "rtf": round(dt / max(in_secs, 1e-6), 4),
        }

    def handle_line(self, line: str) -> str:
        parts = line.split()
        if len(parts) != 2:
            return json.dumps(
                {"ok": False, "error": "expected '<in_wav> <out_wav>'"}
            )
        try:
            return json.dumps(self.convert_file(parts[0], parts[1]))
        except Exception as e:  # surface errors to the client, keep serving
            logging.exception("request failed: %s", line)
            return json.dumps({"ok": False, "error": f"{type(e).__name__}: {e}"})


def serve_stdio(service: ConversionService):
    logging.info("serving on stdio (one '<in_wav> <out_wav>' per line)")
    print(json.dumps({"ready": True}), flush=True)
    for line in sys.stdin:
        line = line.strip()
        if not line:
            break
        print(service.handle_line(line), flush=True)


def serve_tcp(service: ConversionService, host: str, port: int):
    import socketserver

    class Handler(socketserver.StreamRequestHandler):
        def handle(self):
            for raw in self.rfile:
                line = raw.decode("utf-8", "replace").strip()
                if not line:
                    break
                self.wfile.write((service.handle_line(line) + "\n").encode())
                self.wfile.flush()

    class Server(socketserver.ThreadingTCPServer):
        allow_reuse_address = True
        daemon_threads = True

    with Server((host, port), Handler) as srv:
        logging.info("serving on %s:%d", host, srv.server_address[1])
        print(json.dumps({"ready": True, "port": srv.server_address[1]}), flush=True)
        srv.serve_forever()


def main():
    from ..core.cache import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser(
        description="Warm wav->wav VC server (AAS-VC single-jit pipeline)"
    )
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--config", default=None,
                        help="defaults to <ckpt_dir>/config.yml")
    parser.add_argument("--src-stats", required=True)
    parser.add_argument("--trg-stats", required=True)
    parser.add_argument("--vocoder-checkpoint", required=True)
    parser.add_argument("--vocoder-config", default=None)
    parser.add_argument("--vocoder-stats", default=None)
    parser.add_argument("--feat-type", default="mel")
    parser.add_argument("--bucket-frames", type=int, default=128,
                        help="input length quantum (one compile per bucket)")
    parser.add_argument("--warmup-seconds", default="2",
                        help="comma-separated durations to pre-compile ('' = none)")
    parser.add_argument("--port", type=int, default=None,
                        help="TCP port (0 = ephemeral); default stdio mode")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--verbose", type=int, default=1)
    args = parser.parse_args()

    logging.basicConfig(
        level=logging.INFO if args.verbose else logging.WARNING,
        format="%(asctime)s (%(module)s:%(lineno)d) %(levelname)s: %(message)s",
        stream=sys.stderr,
    )

    converter = build_converter(args)
    service = ConversionService(converter, converter.sr)
    if args.warmup_seconds:
        service.warmup([float(s) for s in args.warmup_seconds.split(",") if s])

    if args.port is None:
        serve_stdio(service)
    else:
        serve_tcp(service, args.host, args.port)


if __name__ == "__main__":
    main()

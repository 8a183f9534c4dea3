"""Warm wav->wav conversion server (single-jit pipeline, persistent process).

Beyond-reference production surface. The reference converts offline by
chaining five file-based processes (feature extraction -> normalize ->
``bin/vc_decode.py`` -> vocoder -> wav), paying model load + CUDA init per
invocation. On TPU the economics are inverted: compilation dominates
(minutes over a remote-compile tunnel) while a warm conversion is
milliseconds — so the production deployment is a resident process that
compiles each length bucket once and serves every subsequent request from
the jit cache. NAR checkpoints (AASVC / FastSpeechVC) ride
``pipeline.Wav2WavConverter`` (log-mel -> normalize -> conversion -> stat
chain -> chunked HiFi-GAN as ONE compiled program); VTN rides
``pipeline.Wav2WavARConverter`` (chunked AR driver).

Protocols (newline-delimited, one request per line):

- stdio (default): ``<in_wav> <out_wav>`` on stdin; a JSON result line per
  request on stdout. Empty line or EOF ends the session.
- TCP (``--port N``): same line protocol per connection
  (``printf 'in.wav out.wav\\n' | nc host N``). Device access is
  serialized with a lock — one TPU program at a time, any number of
  client connections.

With ``--max-batch B`` (TCP mode), concurrent requests are transparently
micro-batched: up to B requests queued within ``--batch-window-ms`` of each
other run as ONE batched NAR dispatch (``Wav2WavConverter.convert_batch``),
multiplying server throughput at near-constant per-dispatch device time.

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
    if model_type not in ("AASVC", "FastSpeechVC", "VTN"):
        raise NotImplementedError(
            f"vc_serve hosts AASVC/FastSpeechVC (single-jit NAR pipeline) "
            f"and VTN (chunked AR pipeline); got {model_type!r}"
        )
    is_ar = model_type == "VTN"
    model = get_model_class(model_type)(**config["model_params"])

    d = config["model_params"]["idim"]
    dummy = {
        "xs": np.zeros((1, 64, d), np.float32),
        "ilens": np.asarray([64], np.int32),
        "ys": np.zeros((1, 64, config["model_params"]["odim"]), np.float32),
        "olens": np.asarray([64], np.int32),
    }
    cfg_for_init = dict(config)
    if is_ar:
        dummy["labels"] = np.zeros((1, 64), np.float32)
        cfg_for_init["collater_type"] = "ARVCCollater"
    else:
        dummy["dp_inputs"] = np.zeros((1, 64, d), np.float32)
        dummy["dplens"] = np.asarray([64], np.int32)
        if model_type == "FastSpeechVC":
            dummy["durations"] = np.ones((1, 64), np.int32)
            dummy["duration_lens"] = np.asarray([64], np.int32)
        cfg_for_init["collater_type"] = config.get(
            "collater_type", "NARVCCollater"
        )
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
    cls = Wav2WavConverter
    if is_ar:
        from ..pipeline import Wav2WavARConverter as cls  # noqa: N813
    return cls(
        model, params, voc, vparams, src_stats, trg_stats, config,
        vocoder_stats=vocoder_stats, bucket_frames=args.bucket_frames,
    )


class _Request:
    __slots__ = ("audio", "event", "result", "error", "batch_n")

    def __init__(self, audio):
        self.audio = audio
        self.event = threading.Event()
        self.result = None
        self.error = None
        self.batch_n = 1


class ConversionService:
    """Thread-safe wrapper: one TPU program in flight at a time.

    With ``max_batch > 1``, concurrent requests are transparently
    micro-batched: a dispatcher thread drains up to ``max_batch`` queued
    requests (waiting ``batch_window_ms`` after the first) and runs them as
    ONE ``convert_batch`` model dispatch — the (B, T) NAR forward costs
    barely more than B=1 on the MXU, so server throughput scales with
    concurrency while single-request latency only pays the window. Batch
    sizes are rounded up to powers of two (repeating the first item) so the
    jit cache holds at most log2(max_batch) batched programs per length
    bucket.
    """

    def __init__(self, converter, sr: int, max_batch: int = 1,
                 batch_window_ms: float = 8.0):
        self.converter = converter
        self.sr = sr
        self.max_batch = max(1, int(max_batch))
        self.batch_window_s = float(batch_window_ms) / 1e3
        self._lock = threading.Lock()
        self._n = 0
        self._queue = None
        self.last_activity = time.time()
        if self.max_batch > 1:
            import queue

            self._queue = queue.Queue()
            threading.Thread(target=self._dispatch_loop, daemon=True).start()

    def _next_rng(self):
        import jax

        self._n += 1
        return jax.random.PRNGKey(self._n)

    def busy(self) -> bool:
        """True while a device program is in flight or requests are queued.

        The idle watchdog must not count a long-running request as idleness:
        the FIRST request at a new batch shape compiles for minutes over the
        remote-compile tunnel, and a watchdog that only looks at
        ``last_activity`` (stamped at request START) would shut the server
        down mid-request (observed: scripts/bench_serve_load.py smoke run —
        a 182 s first micro-batch compile outlived a 45 s idle bound and the
        remaining clients got connection-refused)."""
        if self._lock.locked():
            return True
        return self._queue is not None and not self._queue.empty()

    def _run(self, audio):
        """Convert one waveform; returns (wav, batch_size_it_rode_in)."""
        self.last_activity = time.time()
        try:
            if self._queue is None:
                with self._lock:
                    return self.converter(audio, rng=self._next_rng()), 1
            req = _Request(audio)
            self._queue.put(req)
            req.event.wait()
            if req.error is not None:
                raise req.error
            return req.result, req.batch_n
        finally:
            # stamp the END too: idleness is measured from the last moment
            # the server finished doing something, not from request arrival
            self.last_activity = time.time()

    def _dispatch_loop(self):
        while True:
            batch = [self._queue.get()]
            deadline = time.time() + self.batch_window_s
            while len(batch) < self.max_batch:
                try:
                    batch.append(
                        self._queue.get(timeout=max(0.0, deadline - time.time()))
                    )
                except Exception:  # queue.Empty
                    break
            try:
                with self._lock:
                    rng = self._next_rng()
                    if len(batch) == 1:
                        outs = [self.converter(batch[0].audio, rng=rng)]
                    else:
                        # pad to the next power of two (repeat item 0) so the
                        # number of compiled batch shapes stays logarithmic
                        n_pad = 1
                        while n_pad < len(batch):
                            n_pad *= 2
                        n_pad = min(n_pad, self.max_batch)
                        audios = [r.audio for r in batch]
                        audios += [audios[0]] * (n_pad - len(audios))
                        outs = self.converter.convert_batch(audios, rng=rng)
                for req, out in zip(batch, outs):
                    req.result = out
                    req.batch_n = len(batch)
                    req.event.set()
            except Exception as e:  # deliver the failure to every waiter
                for req in batch:
                    req.error = e
                    req.event.set()

    def warmup(self, seconds):
        for s in seconds:
            t0 = time.time()
            self.converter(np.zeros(int(self.sr * s), np.float32))
            logging.info("warmup %.1fs bucket: %.1fs", s, time.time() - t0)
            # output lengths are stochastic (SDP / AR stop), so requests
            # land on synthesis buckets the zero-input warmup never saw —
            # precompile the whole geometric ladder for this input bucket
            # (a cold synth length is a ~30-50 s remote compile on axon;
            # it dominated serve p50 before this: 31 s/request measured)
            t0 = time.time()
            n = self.converter.warmup_synth()
            logging.info(
                "warmup %.1fs synth ladder (%d buckets): %.1fs",
                s, n, time.time() - t0,
            )
            if self.max_batch > 1:
                # the dispatcher pads micro-batches to the next power of
                # two, so EVERY pow2 shape <= max_batch is reachable —
                # warm them all (load run r5: a cold B=4 program mid-load
                # cost a 25 s p95 spike)
                b = 2
                while b <= self.max_batch:
                    t0 = time.time()
                    self.converter.convert_batch(
                        [np.zeros(int(self.sr * s), np.float32)] * b
                    )
                    logging.info(
                        "warmup %.1fs bucket B=%d: %.1fs",
                        s, b, time.time() - t0,
                    )
                    b *= 2

    def convert_file(self, in_path: str, out_path: str) -> dict:
        from ..bin.preprocess import resample
        from ..utils.audio import read_wav, write_wav

        t0 = time.time()
        audio, sr = read_wav(in_path)
        if audio.ndim > 1:
            audio = audio.mean(axis=-1)
        if sr != self.sr:
            audio = resample(audio.astype(np.float32), sr, self.sr)
        in_secs = len(audio) / self.sr
        y, batch_n = self._run(audio.astype(np.float32))
        write_wav(out_path, y, self.sr)
        dt = time.time() - t0
        return {
            "ok": True,
            "out": out_path,
            "input_seconds": round(in_secs, 3),
            "output_seconds": round(len(y) / self.sr, 3),
            "wall_ms": round(dt * 1e3, 1),
            "rtf": round(dt / max(in_secs, 1e-6), 4),
            "batch": batch_n,
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


def serve_tcp(service: ConversionService, host: str, port: int,
              max_idle_seconds: float = 0.0):
    """TCP line server with graceful drain.

    On single-accelerator deployments an orphaned resident server is worse
    than a crash: it silently holds the device client/grant and starves every
    other process (observed with this image's one-process-per-chip TPU
    relay). Two guards:

    - SIGTERM/SIGINT trigger a *drain* — stop accepting, wait for the device
      lock so no program is mid-execution (an abort mid-execution wedges the
      chip for minutes), then exit 0.
    - ``max_idle_seconds > 0``: a watchdog exits the server after that long
      without a request, so forgotten daemons release the device on their own.
    """
    import signal
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
        def _graceful(signum, frame):
            logging.info("signal %d: draining and shutting down", signum)
            threading.Thread(target=srv.shutdown, daemon=True).start()

        old_handlers = {}
        if threading.current_thread() is threading.main_thread():
            old_handlers = {
                s: signal.signal(s, _graceful)
                for s in (signal.SIGTERM, signal.SIGINT)
            }
        if max_idle_seconds and max_idle_seconds > 0:
            def _watchdog():
                while True:
                    time.sleep(min(30.0, max_idle_seconds / 2))
                    if service.busy():  # in-flight program != idle
                        continue
                    idle = time.time() - service.last_activity
                    if idle > max_idle_seconds:
                        logging.info(
                            "idle %.0fs > --max-idle-seconds %.0f: exiting",
                            idle, max_idle_seconds,
                        )
                        threading.Thread(
                            target=srv.shutdown, daemon=True
                        ).start()
                        return

            threading.Thread(target=_watchdog, daemon=True).start()
        logging.info("serving on %s:%d", host, srv.server_address[1])
        print(json.dumps({"ready": True, "port": srv.server_address[1]}), flush=True)
        srv.serve_forever()
        # drain: no new work is accepted; take the device lock so any
        # in-flight TPU program finishes before the process exits
        with service._lock:
            pass
        for s, h in old_handlers.items():
            signal.signal(s, h)
        logging.info("drained; exiting cleanly")


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
    parser.add_argument("--max-batch", type=int, default=1,
                        help="micro-batch concurrent requests into one (B, T) "
                             "model dispatch (TCP mode; 1 = off)")
    parser.add_argument("--batch-window-ms", type=float, default=8.0,
                        help="how long the dispatcher waits for co-riders "
                             "after the first queued request")
    parser.add_argument("--port", type=int, default=None,
                        help="TCP port (0 = ephemeral); default stdio mode")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--max-idle-seconds", type=float, default=0.0,
                        help="TCP mode: exit after this long without a "
                             "request (0 = never; forgotten daemons hold the "
                             "accelerator and starve other processes)")
    parser.add_argument("--verbose", type=int, default=1)
    args = parser.parse_args()

    logging.basicConfig(
        level=logging.INFO if args.verbose else logging.WARNING,
        format="%(asctime)s (%(module)s:%(lineno)d) %(levelname)s: %(message)s",
        stream=sys.stderr,
    )

    converter = build_converter(args)
    service = ConversionService(
        converter, converter.sr,
        max_batch=args.max_batch, batch_window_ms=args.batch_window_ms,
    )
    if args.warmup_seconds:
        service.warmup([float(s) for s in args.warmup_seconds.split(",") if s])

    if args.port is None:
        serve_stdio(service)
    else:
        serve_tcp(service, args.host, args.port,
                  max_idle_seconds=args.max_idle_seconds)


if __name__ == "__main__":
    main()

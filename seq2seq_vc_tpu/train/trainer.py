"""Step-driven trainer base.

Capability match with reference ``trainers/base.py:18-227``: step-driven run
loop with log/eval/save intervals, checkpoint save/load (params, optimizer,
steps, epochs), TensorBoard scalars, intermediate dev-sample generation
hooks, and module freezing (handled in the optax chain — see train/optim).

TPU-first: the entire loss+grad+update is one jitted function per trainer
subclass, donated and cached per batch bucket shape; batches are sharded
over the mesh's data axis and pjit inserts the gradient all-reduce
(replacing DDP/NCCL — SURVEY.md §2.10). Rank gating uses
``parallel.is_coordinator``.
"""

from __future__ import annotations

import logging
import os
import time
from collections import defaultdict
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from ..core.checkpoint import load_checkpoint, save_checkpoint
from ..parallel.mesh import is_coordinator, shard_batch
from .state import TrainState


class Trainer:
    """Base trainer. Subclasses implement ``loss_fn(params, batch, rngs,
    flags) -> (loss, metrics)`` and optionally
    ``generate_intermediate(batch, outdir)``."""

    def __init__(
        self,
        model,
        state: TrainState,
        criterion: Dict[str, Any],
        config: Dict[str, Any],
        train_loader,
        dev_loader=None,
        mesh=None,
        rng=None,
        writer=None,
    ):
        self.model = model
        self.state = state
        self.criterion = criterion
        self.config = config
        self.train_loader = train_loader
        self.dev_loader = dev_loader
        self.mesh = mesh
        self.rng = rng if rng is not None else jax.random.PRNGKey(config.get("seed", 0))
        self.steps = int(state.steps)
        self.epochs = 0
        self.finish_train = False
        self.total_train_loss: Dict[str, float] = defaultdict(float)
        self.outdir = config.get("outdir", "exp")
        self.writer = writer
        if self.writer is None and is_coordinator():
            try:
                from tensorboardX import SummaryWriter

                self.writer = SummaryWriter(self.outdir)
            except Exception:  # pragma: no cover - tensorboard optional
                self.writer = None
        self._jit_cache: Dict[Any, Any] = {}
        # steps counts OPTIMIZER steps (reference trainers/base.py:65,135-136);
        # with gradient accumulation each optimizer step spans grad_accum
        # micro-batches (optax.MultiSteps applies the update on the last one).
        self.grad_accum = int(config.get("gradient_accumulate_steps", 1) or 1)
        # pipeline parallelism: batches must split into n_micro microbatches
        # (shard_batch pads partial batches to n_micro * data)
        _pp = int(config.get("pipeline_parallel", 1) or 1)
        self._pp_microbatches = (
            int(config.get("pipeline_microbatches", 0) or _pp) if _pp > 1 else 1
        )
        self._micro_total = self.steps * self.grad_accum
        # metrics stay on device until the log interval; fetching every step
        # would force a host sync per step and kill device/host overlap.
        self._pending_metrics: list = []
        self._interval_tick = time.time()
        self._step_costs: Dict[Any, Tuple[float, float]] = {}
        self._last_cost_key = None
        self._profiling = False

    # ------------------------------------------------------------------ api
    def run(self):
        self.tick = time.time()
        max_steps = self.config["train_max_steps"]
        logging.info("training starts: %d steps", max_steps)
        while not self.finish_train:
            self._train_epoch()
        from ..core.checkpoint import wait_for_async_checkpoints

        wait_for_async_checkpoints()
        logging.info("finished training (%d steps)", self.steps)

    # ----------------------------------------------------------------- core
    def loss_fn(self, params, batch, rngs, flags, deterministic=False):
        raise NotImplementedError

    def _flags(self) -> Any:
        """Hashable static flags for the jitted step (e.g. dp-loss gate)."""
        return ()

    def _array_batch(self, batch: Dict[str, Any]) -> Dict[str, Any]:
        arrays = {
            k: v for k, v in batch.items() if isinstance(v, np.ndarray)
        }
        if self.mesh is not None:
            arrays = shard_batch(
                arrays, self.mesh, extra_multiple=self._pp_microbatches
            )
        return arrays

    def _get_step_fn(self, flags):
        if flags in self._jit_cache:
            return self._jit_cache[flags]

        def step(state, batch, rng):
            k1, k2 = jax.random.split(rng)
            rngs = {"dropout": k1, "noise": k2}

            def lf(params):
                return self.loss_fn(params, batch, rngs, flags, deterministic=False)

            (loss, metrics), grads = jax.value_and_grad(lf, has_aux=True)(state.params)
            new_state = state.apply_gradients(grads)
            metrics = dict(metrics)
            metrics["loss"] = loss
            return new_state, metrics

        fn = jax.jit(step, donate_argnums=(0,))
        self._jit_cache[flags] = fn
        return fn

    # -------------------------------------------------------- observability
    def _record_step_cost(self, fn, flags, arrays, rng):
        """XLA-reported FLOPs/bytes for one train-step shape (for MFU logs).

        Replaces the reference's absent profiling layer (SURVEY.md §5) with
        the TPU-native equivalent: ``jit(...).lower().compile()`` shares the
        executable cache with the live call, so ``cost_analysis`` is free.
        Gated behind ``log_mfu`` (an extra trace per batch bucket).
        """
        key = tuple(sorted((k, v.shape) for k, v in arrays.items()))
        if key in self._step_costs:
            return
        try:
            cost = fn.lower(self.state, arrays, rng).compile().cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            self._step_costs[key] = (
                float(cost.get("flops", 0.0)),
                float(cost.get("bytes accessed", 0.0)),
            )
        except Exception as e:  # pragma: no cover - cost analysis optional
            logging.debug("cost_analysis unavailable: %s", e)
            self._step_costs[key] = (0.0, 0.0)
        self._last_cost_key = key

    @staticmethod
    def _device_peak_flops() -> Optional[float]:
        """Single-chip bf16 peak for the local device kind, or None when the
        kind isn't in the table (axon tunnel kinds may not match) — callers
        must then report TF/s only, never a fabricated MFU."""
        kind = jax.devices()[0].device_kind.lower()
        table = {
            "v2": 45e12, "v3": 123e12, "v4": 275e12,
            "v5 lite": 197e12, "v5e": 197e12, "v5p": 459e12, "v5": 459e12,
            "v6 lite": 918e12, "v6e": 918e12,
        }
        for name, peak in table.items():
            if name in kind:
                return peak
        return None

    def _maybe_profile(self):
        """Start/stop a jax.profiler trace at configured optimizer steps.

        ``profile_start_step``/``profile_stop_step`` in the config bound the
        traced window; the trace lands in ``<outdir>/profile`` (TensorBoard
        'profile' plugin format).
        """
        start = self.config.get("profile_start_step")
        stop = self.config.get("profile_stop_step")
        if start is None or not is_coordinator():
            return
        # the axon remote runtime has no device-trace support; start_trace
        # blocks forever and wedges the chip (CLAUDE.md). Refuse unless the
        # user explicitly overrides with profile_force: true.
        if jax.default_backend() not in ("cpu", "gpu", "tpu") and not self.config.get(
            "profile_force"
        ):
            if not self._profiling:
                logging.warning(
                    "profile_start_step set but backend %r has no device-trace "
                    "support (jax.profiler.start_trace hangs on the axon tunnel); "
                    "skipping. Set profile_force: true to override.",
                    jax.default_backend(),
                )
                self._profiling = True  # warn once
            return
        if not self._profiling and self.steps >= int(start) and (
            stop is None or self.steps < int(stop)
        ):
            path = os.path.join(self.outdir, "profile")
            jax.profiler.start_trace(path)
            self._profiling = True
            logging.info("profiler trace started -> %s", path)
        elif self._profiling and stop is not None and self.steps >= int(stop):
            jax.profiler.stop_trace()
            self._profiling = False
            logging.info("profiler trace stopped")

    def _get_eval_fn(self, flags):
        key = ("eval", flags)
        if key in self._jit_cache:
            return self._jit_cache[key]

        def eval_step(params, batch, rng):
            # deterministic=True: dev losses must not be train-mode noisy
            # (rngs still threaded for modules with always-on dropout, e.g.
            # the Tacotron prenet, matching the reference's eval behavior).
            k1, k2 = jax.random.split(rng)
            return self.loss_fn(
                params, batch, {"dropout": k1, "noise": k2}, flags,
                deterministic=True,
            )

        fn = jax.jit(eval_step)
        self._jit_cache[key] = fn
        return fn

    def _train_step(self, batch: Dict[str, Any]):
        arrays = self._array_batch(batch)
        rng = jax.random.fold_in(self.rng, self._micro_total)
        fn = self._get_step_fn(self._flags())
        if self.config.get("log_mfu"):
            self._record_step_cost(fn, self._flags(), arrays, rng)
        self.state, metrics = fn(self.state, arrays, rng)
        # defer the host fetch to the log interval; keep the step async
        self._pending_metrics.append(metrics)
        self._micro_total += 1
        boundary = self._micro_total % self.grad_accum == 0
        if boundary:
            self.steps += 1
            self._check_train_finish()
        return boundary

    def _train_epoch(self):
        for batch in self.train_loader:
            boundary = self._train_step(batch)
            # interval checks fire once per OPTIMIZER step, not per micro-batch
            if boundary:
                self._maybe_profile()
            if boundary and is_coordinator():
                self._check_log_interval()
                self._check_eval_interval()
                self._check_save_interval()
            if self.finish_train:
                return
        self.epochs += 1

    # ------------------------------------------------------------ intervals
    def _check_train_finish(self):
        if self.steps >= self.config["train_max_steps"]:
            self.finish_train = True

    def _check_log_interval(self):
        interval = self.config.get("log_interval_steps", 100)
        if self.steps % interval == 0 and self.steps > 0 and self._pending_metrics:
            # one host sync per interval: wait for the last dispatched step,
            # then fetch the (already computed) deferred metrics.
            jax.block_until_ready(self._pending_metrics[-1]["loss"])
            n_micro = len(self._pending_metrics)
            avg_t = (time.time() - self._interval_tick) / max(n_micro, 1)
            for metrics in self._pending_metrics:
                for k, v in metrics.items():
                    self.total_train_loss[f"train/{k}"] += float(v)
            # average over MICRO-batches: with gradient accumulation there are
            # interval*grad_accum pending entries per `interval` optimizer
            # steps; dividing by `interval` would inflate losses by the accum
            # factor (reference reports per-batch means, trainers/base.py:186-194)
            for key, value in self.total_train_loss.items():
                avg = value / max(n_micro, 1)
                logging.info("(steps: %d) %s = %.4f.", self.steps, key, avg)
                if self.writer:
                    self.writer.add_scalar(key, avg, self.steps)
            if self.writer:
                self.writer.add_scalar("train/step_time_sec", avg_t, self.steps)
            # device memory telemetry (reference logs CUDA peak memory per
            # interval, trainers/base.py:215-217)
            try:
                mem = jax.local_devices()[0].memory_stats() or {}
                peak = mem.get("peak_bytes_in_use")
                if peak:
                    logging.info(
                        "(steps: %d) device peak memory = %.1f MiB.",
                        self.steps, peak / 2**20,
                    )
                    if self.writer:
                        self.writer.add_scalar(
                            "train/peak_memory_mib", peak / 2**20, self.steps
                        )
            except Exception:  # pragma: no cover - not all backends report
                pass
            if self._last_cost_key is not None and avg_t > 0:
                flops, hbm_bytes = self._step_costs[self._last_cost_key]
                if flops:
                    tflops = flops / avg_t / 1e12
                    peak = self._device_peak_flops()
                    kind = jax.devices()[0].device_kind
                    if peak is not None:
                        mfu_txt = f"mfu = {flops / avg_t / peak:.3f} ({kind})"
                    else:
                        mfu_txt = f"mfu = n/a (unknown device kind {kind!r})"
                    logging.info(
                        "(steps: %d) train/tflops_per_sec = %.2f, %s, "
                        "hbm_GBps = %.1f.",
                        self.steps, tflops, mfu_txt, hbm_bytes / avg_t / 1e9,
                    )
                    if self.writer:
                        self.writer.add_scalar("train/tflops_per_sec", tflops, self.steps)
                        if peak is not None:
                            self.writer.add_scalar(
                                "train/mfu", flops / avg_t / peak, self.steps
                            )
            self.total_train_loss = defaultdict(float)
            self._pending_metrics = []
            self._interval_tick = time.time()

    def _check_eval_interval(self):
        interval = self.config.get("eval_interval_steps", 0)
        if interval and self.steps % interval == 0 and self.dev_loader is not None:
            self._eval_epoch()

    def _check_save_interval(self):
        interval = self.config.get("save_interval_steps", 0)
        if interval and self.steps % interval == 0:
            path = os.path.join(self.outdir, f"checkpoint-{self.steps}steps.ckpt")
            self.save_checkpoint(path)
            logging.info("saved checkpoint @ %d steps", self.steps)

    # ----------------------------------------------------------------- eval
    def _eval_epoch(self):
        total: Dict[str, float] = defaultdict(float)
        n = 0
        first_batch = None
        eval_fn = self._get_eval_fn(self._flags())
        for batch in self.dev_loader:
            arrays = self._array_batch(batch)
            if first_batch is None:
                first_batch = batch
            loss, metrics = eval_fn(self.state.params, arrays, jax.random.PRNGKey(1))
            total["loss"] += float(loss)
            for k, v in metrics.items():
                total[k] += float(v)
            n += 1
        for k, v in total.items():
            avg = v / max(n, 1)
            logging.info("(steps: %d) dev/%s = %.4f.", self.steps, k, avg)
            if self.writer:
                self.writer.add_scalar(f"dev/{k}", avg, self.steps)
        if first_batch is not None:
            try:
                outdir = os.path.join(
                    self.outdir, "predictions", f"{self.steps}steps"
                )
                self.generate_intermediate(first_batch, outdir)
            except NotImplementedError:
                pass
            except Exception as e:  # pragma: no cover
                logging.warning("intermediate generation failed: %s", e)

    def generate_intermediate(self, batch, outdir: str):
        raise NotImplementedError

    # ----------------------------------------------------------- checkpoint
    def save_checkpoint(self, path: str):
        save_checkpoint(
            path,
            self.state.params,
            self.state.opt_state,
            self.steps,
            self.epochs,
            backend=self.config.get("checkpoint_backend", "msgpack"),
            async_save=bool(self.config.get("checkpoint_async", False)),
        )

    def load_checkpoint(self, path: str, load_only_params: bool = False):
        restored = load_checkpoint(
            path,
            self.state.params,
            None if load_only_params else self.state.opt_state,
        )
        self.state = self.state.replace(params=restored["model"])
        if not load_only_params:
            self.state = self.state.replace(
                opt_state=restored["optimizer"], steps=restored["steps"]
            )
            self.steps = restored["steps"]
            self.epochs = restored["epochs"]
            self._micro_total = self.steps * self.grad_accum

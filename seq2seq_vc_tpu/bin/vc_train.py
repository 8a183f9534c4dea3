"""VC training driver.

Capability match with reference ``bin/vc_train.py:53-487``: YAML config +
CLI merge + overlay, dataset/collater/model/criterion/optimizer/scheduler
construction by config name, pretrained-module transfer (init-checkpoint +
init-mods), resume, module freezing (freeze-mods), trainer.run() with a
final checkpoint in ``finally``.

TPU-first: no DDP/NCCL/launcher — one process per host, a
``jax.sharding.Mesh`` data axis spans all devices, and pjit inserts the
gradient all-reduce (SURVEY.md §2.10). Model init is jitted (eager init is
pathologically slow over a remote-dispatch TPU tunnel).
"""

from __future__ import annotations

import argparse
import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

import seq2seq_vc_tpu
from ..core.checkpoint import partial_transfer, load_checkpoint
from ..core.config import dump_config, load_config, merge_args
from ..losses import get_criterion
from ..models import get_model_class
from ..parallel.mesh import get_mesh, is_coordinator
from ..train import get_trainer_class
from ..train.data import ARVCCollater, DataLoader, NARVCCollater, ParallelVCMelDataset
from ..train.optim import build_optimizer
from ..train.state import TrainState


def build_collater(config):
    name = config.get("collater_type", "ARVCCollater")
    mp = config.get("model_params", {})
    pad = config.get("pad_multiple", 32)
    if name == "ARVCCollater":
        return ARVCCollater(pad, mp.get("decoder_reduction_factor", 1))
    if name == "NARVCCollater":
        return NARVCCollater(
            pad,
            mp.get("encoder_reduction_factor", 1),
            mp.get("post_encoder_reduction_factor", 1),
            mp.get("decoder_reduction_factor", 1),
        )
    raise ValueError(f"unknown collater_type: {name}")


def init_model_params(model, config, sample_batch):
    """Jitted parameter init from a sample batch's shapes.

    ALL array inputs — including PRNG keys — ride in as jit *arguments* or
    are created inside the traced function; closure-captured device arrays
    (even an 8-byte PRNGKey) force a device->host fetch during MLIR constant
    embedding, which can block indefinitely over a remote-dispatch TPU
    tunnel.
    """
    seed = config.get("seed", 0)
    b = {k: v for k, v in sample_batch.items() if isinstance(v, np.ndarray)}

    def make_keys(seed):
        return {
            "params": jax.random.PRNGKey(seed),
            "dropout": jax.random.PRNGKey(seed + 1),
            "noise": jax.random.PRNGKey(seed + 2),
        }

    if config.get("collater_type", "ARVCCollater") == "ARVCCollater":
        def init_fn(b, seed):
            return model.init(
                make_keys(seed), b["xs"], b["ilens"], b["ys"], b["labels"],
                b["olens"], deterministic=True,
            )
    else:
        model_type = config["model_type"]
        if model_type == "FastSpeechVC":
            def init_fn(b, seed):
                return model.init(
                    make_keys(seed), b["xs"], b["ilens"], b["ys"], b["olens"],
                    b["durations"], b.get("duration_lens"),
                    b.get("dp_inputs"), b.get("dplens"),
                    deterministic=True,
                )
        else:
            def init_fn(b, seed):
                return model.init(
                    make_keys(seed), b["xs"], b["ilens"], b["ys"], b["olens"],
                    b.get("dp_inputs"), b.get("dplens"),
                    deterministic=True,
                )
    return jax.jit(init_fn)(b, seed)


def main():
    from ..core.cache import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser(description="Train a VC model (TPU-native)")
    parser.add_argument("--src-train-dumpdir", required=True)
    parser.add_argument("--src-dev-dumpdir", required=True)
    parser.add_argument("--trg-train-dumpdir", required=True)
    parser.add_argument("--trg-dev-dumpdir", required=True)
    parser.add_argument("--trg-stats", default=None)
    parser.add_argument("--src-feat-type", default="mel")
    parser.add_argument("--trg-feat-type", default="mel")
    parser.add_argument("--train-dp-input-dir", default=None)
    parser.add_argument("--dev-dp-input-dir", default=None)
    parser.add_argument("--train-duration-dir", default=None)
    parser.add_argument("--dev-duration-dir", default=None)
    parser.add_argument("--outdir", required=True)
    parser.add_argument("--config", required=True)
    parser.add_argument("--additional-config", default=None)
    parser.add_argument("--init-checkpoint", default="")
    parser.add_argument("--resume", default="")
    parser.add_argument("--verbose", type=int, default=1)
    args = parser.parse_args()

    logging.basicConfig(
        level=logging.INFO if args.verbose else logging.WARNING,
        format="%(asctime)s (%(module)s:%(lineno)d) %(levelname)s: %(message)s",
    )
    if not is_coordinator():
        logging.getLogger().setLevel(logging.ERROR)

    config = merge_args(load_config(args.config), args, args.additional_config)
    os.makedirs(args.outdir, exist_ok=True)
    dump_config(config, args.outdir, seq2seq_vc_tpu.__version__)

    # hardware RNG for dropout masks: threefry mask generation costs ~37 ms
    # of an 80 ms arctic-vc2 train step on TPU v5e (scripts/profile_train.py
    # --prng ablation); rbg is the documented-deviation default for training
    jax.config.update(
        "jax_default_prng_impl", config.get("prng_impl", "rbg")
    )

    # data
    collater = build_collater(config)
    train_ds = ParallelVCMelDataset(
        args.src_train_dumpdir,
        args.trg_train_dumpdir,
        dp_feats=args.train_dp_input_dir,
        durations_dir=args.train_duration_dir,
        feat_key=args.src_feat_type,
        allow_cache=config.get("allow_cache", False),
    )
    dev_ds = ParallelVCMelDataset(
        args.src_dev_dumpdir,
        args.trg_dev_dumpdir,
        dp_feats=args.dev_dp_input_dir,
        durations_dir=args.dev_duration_dir,
        feat_key=args.src_feat_type,
        allow_cache=config.get("allow_cache", False),
    )
    train_loader = DataLoader(
        train_ds, collater, config["batch_size"], shuffle=True,
        seed=config.get("seed", 0),
    )
    dev_loader = DataLoader(
        dev_ds, collater, config["batch_size"], shuffle=False,
    )
    logging.info("train utts = %d, dev utts = %d", len(train_ds), len(dev_ds))

    # parallel layout: data x tensor x sequence. sequence_parallel shards
    # the conformer attention time axis over the mesh 'seq' axis with ring
    # attention (parallel/ring_attention.py) — the Hi-Fi-CAPTAIN 48 kHz OOM
    # scenario (reference egs/hificaptain_jp/vc2/README.md); pad_multiple
    # must keep the padded time axes divisible by it.
    tp = int(config.get("tensor_parallel", 1) or 1)
    sp = int(config.get("sequence_parallel", 1) or 1)
    pp = int(config.get("pipeline_parallel", 1) or 1)
    # tp+sp composition is safe: nn/conv.py swaps the k>1 conv backward to
    # partitioner-safe dense contractions whenever the model's sp_mesh
    # composes both axes (the stock conv kernel-grad lowering over-reduces
    # by the idle/model axis — scripts/repro_tp_sp.py).
    # pipeline_parallel composes with DATA parallelism only (GPipe stages
    # run inside a shard_map whose unmentioned axes would over-count param
    # grads — parallel/pp.pipeline_module_stack's gradient note).
    if pp > 1 and (tp > 1 or sp > 1):
        raise ValueError(
            "pipeline_parallel composes with data parallelism only; set "
            "tensor_parallel/sequence_parallel to 1"
        )
    mesh = None
    if len(jax.devices()) > 1 or tp > 1 or sp > 1 or pp > 1:
        mesh = get_mesh(model=tp, seq=sp, pipe=pp)

    # model
    model_class = get_model_class(config["model_type"])
    model_kwargs = dict(config["model_params"])
    # TPU training default: the fused rel-scores kernel (ops/rel_scores.py)
    # — identical math to the dense path modulo fp reassociation, the
    # (T, 2T-1) band tensor never materializes; 76.4 vs 84.1 ms/step at the
    # flagship scale (CLAUDE.md round-4 facts). Same class of default as
    # prng_impl=rbg above; set attention_backend explicitly to override.
    # Models without the knob (VTN's legacy rel-pos falls back internally).
    if (
        "attention_backend" not in model_kwargs
        and jax.default_backend() not in ("cpu",)
        and "attention_backend" in getattr(
            model_class, "__dataclass_fields__", {}
        )
    ):
        model_kwargs["attention_backend"] = "fused"
    if sp > 1:
        model_kwargs["sp_mesh"] = mesh
    if pp > 1:
        model_kwargs["pipe_mesh"] = mesh
        model_kwargs["pipe_microbatches"] = int(
            config.get("pipeline_microbatches", 0) or 0
        )
    model = model_class(**model_kwargs)

    # criterions
    criterion = {
        name: get_criterion(name, **(params or {}))
        for name, params in config["criterions"].items()
    }
    if config.get("use_guided_attn_loss", False):
        from ..losses import GuidedMultiHeadAttentionLoss

        criterion["guided_attn"] = GuidedMultiHeadAttentionLoss(
            **config.get("guided_attn_loss_params", {})
        )

    # optimizer
    tx, _ = build_optimizer(
        optimizer_type=config.get("optimizer_type", "Adam"),
        optimizer_params=config.get("optimizer_params", {}),
        scheduler=config.get("scheduler", "warmuplr"),
        scheduler_params=config.get("scheduler_params", {}),
        grad_norm=config.get("grad_norm"),
        gradient_accumulate_steps=config.get("gradient_accumulate_steps", 1),
        freeze_mods=config.get("freeze-mods") or config.get("freeze_mods"),
    )

    # init params from a sample batch (jitted). sp_mesh only changes the
    # computation layout (shard_map'd ring attention wants the batch axis
    # divisible by the mesh data axis, which a 1-sample init batch isn't) —
    # the parameter tree is identical, so init through an sp-free clone.
    sample = collater([train_ds[0]])
    init_model = model.clone(sp_mesh=None) if sp > 1 else model
    params = init_model_params(init_model, config, sample)
    n_params = sum(int(np.prod(np.shape(x))) for x in jax.tree_util.tree_leaves(params))
    logging.info("model parameters: %.2fM", n_params / 1e6)

    # pretrained transfer (init-mods)
    if args.init_checkpoint:
        init_mods = config.get("init-mods") or config.get("init_mods") or []
        restored = load_checkpoint(args.init_checkpoint, params)
        if init_mods:
            params = partial_transfer(params, restored["model"], init_mods)
        else:
            params = restored["model"]
        logging.info("initialized from %s", args.init_checkpoint)

    # tensor_parallel: Megatron-style kernel sharding over the mesh 'model'
    # axis (parallel/tp.py); XLA inserts the all-reduces from the sharding
    # annotations. Params are sharded BEFORE the optimizer init so the Adam
    # moments inherit the same layout.
    if mesh is not None and tp > 1:
        from ..parallel import shard_params

        params = shard_params(params, mesh)
        logging.info("tensor parallelism: model axis = %d", tp)
    if sp > 1:
        logging.info("sequence parallelism: seq axis = %d", sp)
    if pp > 1:
        logging.info(
            "pipeline parallelism: pipe axis = %d (%d microbatches)",
            pp, int(config.get("pipeline_microbatches", 0) or pp),
        )
    state = TrainState.create(params, tx)

    trainer_class = get_trainer_class(config.get("trainer_type", "ARVCTrainer"))
    trainer = trainer_class(
        model, state, criterion, config, train_loader, dev_loader, mesh=mesh
    )
    if args.resume:
        trainer.load_checkpoint(args.resume)
        logging.info("resumed from %s (steps=%d)", args.resume, trainer.steps)

    try:
        trainer.run()
    finally:
        trainer.save_checkpoint(
            os.path.join(args.outdir, f"checkpoint-{trainer.steps}steps.ckpt")
        )
        from seq2seq_vc_tpu.core.checkpoint import wait_for_async_checkpoints

        wait_for_async_checkpoints()
        logging.info("saved final checkpoint @ %d steps", trainer.steps)


if __name__ == "__main__":
    main()

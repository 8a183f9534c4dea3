"""TTS training driver (reference ``bin/tts_train.py``): same skeleton as
vc_train but with TTSDataset (text + mel), a token list, and
ARTTSCollater/ARTTSTrainer defaults."""

from __future__ import annotations

import argparse
import logging
import os

import jax
import numpy as np

import seq2seq_vc_tpu
from ..core.checkpoint import load_checkpoint, partial_transfer
from ..core.config import dump_config, load_config, merge_args
from ..losses import get_criterion
from ..models import get_model_class
from ..parallel.mesh import get_mesh, is_coordinator
from ..train import get_trainer_class
from ..train.data import DataLoader
from ..train.optim import build_optimizer
from ..train.state import TrainState
from ..train.tts_data import ARTTSCollater, TTSDataset


def main():
    from ..core.cache import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser(description="Train a TTS model (TPU-native)")
    parser.add_argument("--train-dumpdir", required=True)
    parser.add_argument("--dev-dumpdir", required=True)
    parser.add_argument("--train-text", required=True)
    parser.add_argument("--dev-text", required=True)
    parser.add_argument("--token-list", required=True)
    parser.add_argument("--non-linguistic-symbols", default=None)
    parser.add_argument("--cleaner", default="tacotron")
    parser.add_argument("--g2p", default=None)
    parser.add_argument("--token-type", default="char")
    parser.add_argument("--feat-type", default="mel")
    parser.add_argument("--stats", default=None)
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

    # hardware RNG for dropout masks (see bin/vc_train.py profiling note)
    jax.config.update(
        "jax_default_prng_impl", config.get("prng_impl", "rbg")
    )

    with open(args.token_list, encoding="utf-8") as f:
        token_list = [line.rstrip("\n") for line in f if line.strip()]
    idim = len(token_list)
    logging.info("vocabulary size = %d", idim)

    mp = config.get("model_params", {})
    collater = ARTTSCollater(
        config.get("pad_multiple", 32), mp.get("decoder_reduction_factor", 1)
    )
    ds_kwargs = dict(
        non_linguistic_symbols=args.non_linguistic_symbols,
        cleaner=args.cleaner,
        g2p=args.g2p,
        token_list=token_list,
        token_type=args.token_type,
        feat_key=args.feat_type,
        allow_cache=config.get("allow_cache", False),
    )
    train_ds = TTSDataset(args.train_dumpdir, args.train_text, **ds_kwargs)
    dev_ds = TTSDataset(args.dev_dumpdir, args.dev_text, **ds_kwargs)
    train_loader = DataLoader(
        train_ds, collater, config["batch_size"], shuffle=True,
        seed=config.get("seed", 0),
    )
    dev_loader = DataLoader(dev_ds, collater, config["batch_size"], shuffle=False)
    logging.info("train utts = %d, dev utts = %d", len(train_ds), len(dev_ds))

    model_class = get_model_class(config.get("model_type", "TransformerTTS"))
    model_params = dict(mp)
    model_params["idim"] = idim
    # TPU training default: fused rel-scores kernel (see bin/vc_train.py)
    if (
        "attention_backend" not in model_params
        and jax.default_backend() not in ("cpu",)
        and "attention_backend" in getattr(
            model_class, "__dataclass_fields__", {}
        )
    ):
        model_params["attention_backend"] = "fused"
    model = model_class(**model_params)

    criterion = {
        name: get_criterion(name, **(params or {}))
        for name, params in config["criterions"].items()
    }
    if config.get("use_guided_attn_loss", False):
        from ..losses import GuidedMultiHeadAttentionLoss

        criterion["guided_attn"] = GuidedMultiHeadAttentionLoss(
            **config.get("guided_attn_loss_params", {})
        )

    tx, _ = build_optimizer(
        optimizer_type=config.get("optimizer_type", "Adam"),
        optimizer_params=config.get("optimizer_params", {}),
        scheduler=config.get("scheduler", "warmuplr"),
        scheduler_params=config.get("scheduler_params", {}),
        grad_norm=config.get("grad_norm"),
        gradient_accumulate_steps=config.get("gradient_accumulate_steps", 1),
        freeze_mods=config.get("freeze-mods") or config.get("freeze_mods"),
    )

    sample = collater([train_ds[0]])
    b = {k: v for k, v in sample.items() if isinstance(v, np.ndarray)}

    def _init(b, seed):
        keys = {
            "params": jax.random.PRNGKey(seed),
            "dropout": jax.random.PRNGKey(seed + 1),
        }
        return model.init(
            keys, b["xs"], b["ilens"], b["ys"], b["labels"], b["olens"],
            deterministic=True,
        )

    params = jax.jit(_init)(b, config.get("seed", 0))
    n_params = sum(int(np.prod(np.shape(x))) for x in jax.tree_util.tree_leaves(params))
    logging.info("model parameters: %.2fM", n_params / 1e6)

    if args.init_checkpoint:
        init_mods = config.get("init-mods") or config.get("init_mods") or []
        restored = load_checkpoint(args.init_checkpoint, params)
        params = (
            partial_transfer(params, restored["model"], init_mods)
            if init_mods else restored["model"]
        )
        logging.info("initialized from %s", args.init_checkpoint)

    # tensor_parallel: see bin/vc_train.py (Megatron-style param specs)
    tp = int(config.get("tensor_parallel", 1) or 1)
    mesh = None
    if len(jax.devices()) > 1:
        mesh = get_mesh(model=tp)
        if tp > 1:
            from ..parallel import shard_params

            params = shard_params(params, mesh)
            logging.info("tensor parallelism: model axis = %d", tp)
    state = TrainState.create(params, tx)
    trainer_class = get_trainer_class(config.get("trainer_type", "ARTTSTrainer"))
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

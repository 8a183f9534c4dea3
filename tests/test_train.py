"""Training-layer tests: scheduler math, optimizer freeze masks, checkpoint
roundtrip + partial transfer, data pipeline, and a real few-step training
run (loss decreases) for both AR and AAS trainers on the CPU mesh."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seq2seq_vc_tpu.core.checkpoint import (
    load_checkpoint,
    partial_transfer,
    save_checkpoint,
)
from seq2seq_vc_tpu.losses import get_criterion
from seq2seq_vc_tpu.models import AASVC, VTN
from seq2seq_vc_tpu.parallel import get_mesh
from seq2seq_vc_tpu.train import (
    AASVCTrainer,
    ARVCTrainer,
    TrainState,
    build_optimizer,
    warmup_lr_schedule,
)
from seq2seq_vc_tpu.train.data import (
    ARVCCollater,
    DataLoader,
    NARVCCollater,
    ParallelVCMelDataset,
    pad_batch,
)
from seq2seq_vc_tpu.utils import write_hdf5


def test_warmup_lr_matches_reference_formula():
    # optax count k (completed updates) -> reference f(k + 1): the torch
    # WarmupLR applies f(1) on the very first optimizer step
    sched = warmup_lr_schedule(8e-5, warmup_steps=4000)
    for count in [0, 1, 99, 3999, 9999]:
        step = count + 1
        want = 8e-5 * 4000 ** 0.5 * min(step ** -0.5, step * 4000 ** -1.5)
        assert float(sched(jnp.asarray(count))) == pytest.approx(want, rel=1e-5)
    # peak at warmup_steps equals base lr
    assert float(sched(jnp.asarray(3999))) == pytest.approx(8e-5, rel=1e-6)


def test_optimizer_freeze_mods():
    params = {
        "params": {
            "encoder": {"w": jnp.ones((3,))},
            "decoder": {"w": jnp.ones((3,))},
        }
    }
    tx, _ = build_optimizer(
        optimizer_params={"lr": 0.1},
        scheduler_params={"warmup_steps": 1},
        freeze_mods=["decoder"],
    )
    state = TrainState.create(params, tx)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    new_state = state.apply_gradients(grads)
    assert not np.allclose(
        np.asarray(new_state.params["params"]["encoder"]["w"]), 1.0
    )
    np.testing.assert_allclose(
        np.asarray(new_state.params["params"]["decoder"]["w"]), 1.0
    )


def test_checkpoint_roundtrip_and_partial_transfer(tmp_path):
    params = {
        "params": {
            "encoder": {"w": jnp.arange(3.0)},
            "decoder": {"w": jnp.ones((2,)) * 5},
        }
    }
    tx, _ = build_optimizer(optimizer_params={"lr": 0.1})
    state = TrainState.create(params, tx)
    path = str(tmp_path / "ck.ckpt")
    save_checkpoint(path, state.params, state.opt_state, steps=42, epochs=3)
    restored = load_checkpoint(path, state.params, state.opt_state)
    assert restored["steps"] == 42 and restored["epochs"] == 3
    np.testing.assert_allclose(
        np.asarray(restored["model"]["params"]["encoder"]["w"]), [0, 1, 2]
    )

    target = {
        "params": {
            "encoder": {"w": jnp.zeros(3)},
            "decoder": {"w": jnp.zeros(2)},
        }
    }
    out = partial_transfer(target, restored["model"], ["encoder"])
    np.testing.assert_allclose(np.asarray(out["params"]["encoder"]["w"]), [0, 1, 2])
    np.testing.assert_allclose(np.asarray(out["params"]["decoder"]["w"]), 0.0)


def _make_corpus(tmp_path, n=6, d=80):
    rng = np.random.default_rng(0)
    src_dir, trg_dir = tmp_path / "src", tmp_path / "trg"
    for i in range(n):
        T = 16 + 4 * i
        L = 20 + 4 * i
        write_hdf5(str(src_dir / f"utt{i}.h5"), "feats", rng.standard_normal((T, d)).astype(np.float32))
        write_hdf5(str(trg_dir / f"utt{i}.h5"), "feats", rng.standard_normal((L, d)).astype(np.float32))
    return str(src_dir), str(trg_dir)


def test_dataset_and_loader(tmp_path):
    src, trg = _make_corpus(tmp_path)
    ds = ParallelVCMelDataset(src, trg)
    assert len(ds) == 6
    item = ds[0]
    assert item["src_feat"].shape[1] == 80 and "utt_id" in item
    loader = DataLoader(ds, ARVCCollater(pad_multiple=8, reduction_factor=2), batch_size=4, seed=1)
    batches = list(loader)
    assert len(batches) == 2
    b = batches[0]
    assert b["xs"].shape[0] in (2, 4)
    assert b["ys"].shape[1] % 8 == 0
    # stop labels: 1 from olens-1 onward
    i = 0
    assert b["labels"][i, b["olens"][i] - 1] == 1.0
    assert b["labels"][i, : b["olens"][i] - 1].sum() == 0


def test_pad_batch_bucketing():
    arrays = [np.ones((5, 3)), np.ones((9, 3))]
    out = pad_batch(arrays, 8)
    assert out.shape == (2, 16, 3)
    np.testing.assert_allclose(out[0, :5], 1.0)
    np.testing.assert_allclose(out[0, 5:], 0.0)


@pytest.mark.slow
def test_arvc_trainer_loss_decreases(tmp_path):
    src, trg = _make_corpus(tmp_path, n=4)
    model = VTN(idim=80, odim=80, adim=32, aheads=2, elayers=1, eunits=64,
                dlayers=1, dunits=64, postnet_layers=2, postnet_chans=16,
                dprenet_units=16, decoder_reduction_factor=2)
    ds = ParallelVCMelDataset(src, trg)
    loader = DataLoader(ds, ARVCCollater(pad_multiple=8, reduction_factor=2),
                        batch_size=4, seed=0)
    batch = next(iter(loader))
    keys = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    params = model.init(
        keys, jnp.asarray(batch["xs"]), jnp.asarray(batch["ilens"]),
        jnp.asarray(batch["ys"]), jnp.asarray(batch["labels"]),
        jnp.asarray(batch["olens"]), deterministic=True,
    )
    tx, _ = build_optimizer(
        optimizer_params={"lr": 1e-3}, scheduler_params={"warmup_steps": 10},
        grad_norm=1.0,
    )
    config = {
        "train_max_steps": 8, "log_interval_steps": 100,
        "eval_interval_steps": 0, "save_interval_steps": 0,
        "outdir": str(tmp_path / "exp"), "grad_norm": 1.0,
    }
    trainer = ARVCTrainer(
        model, TrainState.create(params, tx),
        {"Seq2SeqLoss": get_criterion("Seq2SeqLoss")},
        config, loader, mesh=None,
        writer=False,
    )
    for batch in loader:
        trainer._train_step(batch)
        if trainer.steps >= 6:
            break
    trainer.run()  # finish remaining steps without error
    assert trainer.steps == 8
    # metrics are deferred to the log interval; all still finite
    assert np.isfinite(float(trainer._pending_metrics[-1]["loss"]))


@pytest.mark.slow
def test_aasvc_trainer_steps(tmp_path):
    src, trg = _make_corpus(tmp_path, n=4)
    model = AASVC(idim=80, odim=80, adim=32, aheads=2, elayers=1, eunits=64,
                  dlayers=1, dunits=64, postnet_layers=0,
                  post_encoder_reduction_factor=2,
                  duration_predictor_type="stochastic",
                  stochastic_duration_predictor_flows=2,
                  conformer_enc_kernel_size=7, conformer_dec_kernel_size=7)
    ds = ParallelVCMelDataset(src, trg, dp_feats=src)
    coll = NARVCCollater(pad_multiple=8, post_encoder_reduction_factor=2)
    loader = DataLoader(ds, coll, batch_size=4, seed=0)
    batch = next(iter(loader))
    keys = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
            "noise": jax.random.PRNGKey(2)}
    params = model.init(
        keys, jnp.asarray(batch["xs"]), jnp.asarray(batch["ilens"]),
        jnp.asarray(batch["ys"]), jnp.asarray(batch["olens"]),
        jnp.asarray(batch["dp_inputs"]), jnp.asarray(batch["dplens"]),
        deterministic=True,
    )
    tx, _ = build_optimizer(
        optimizer_params={"lr": 1e-3}, scheduler_params={"warmup_steps": 10},
        grad_norm=1.0,
    )
    config = {
        "train_max_steps": 4, "log_interval_steps": 100,
        "eval_interval_steps": 0, "save_interval_steps": 0,
        "outdir": str(tmp_path / "exp"), "grad_norm": 1.0,
        "lambda_align": 2.0, "dp_train_start_steps": 0,
        "criterions": {"L1Loss": {}, "ForwardSumLoss": {},
                       "StochasticDurationPredictorLoss": {}},
    }
    trainer = AASVCTrainer(
        model, TrainState.create(params, tx),
        {"L1Loss": get_criterion("L1Loss")},
        config, loader, mesh=None, writer=False,
    )
    trainer.run()
    assert trainer.steps == 4
    assert np.isfinite(float(trainer._pending_metrics[-1]["loss"]))


@pytest.mark.slow
def test_gradient_accumulation_counts_optimizer_steps(tmp_path):
    """With gradient_accumulate_steps=N, `steps` counts optimizer steps: N
    micro-batches advance `steps` by one, matching the reference semantics
    (trainers/base.py:65,135-136), so train_max_steps / intervals /
    dp_train_start_steps in ported configs keep their meaning."""
    src, trg = _make_corpus(tmp_path, n=4)
    model = VTN(idim=80, odim=80, adim=32, aheads=2, elayers=1, eunits=64,
                dlayers=1, dunits=64, postnet_layers=0,
                dprenet_units=16, decoder_reduction_factor=2)
    ds = ParallelVCMelDataset(src, trg)
    loader = DataLoader(ds, ARVCCollater(pad_multiple=8, reduction_factor=2),
                        batch_size=2, seed=0)
    batch = next(iter(loader))
    keys = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    params = model.init(
        keys, jnp.asarray(batch["xs"]), jnp.asarray(batch["ilens"]),
        jnp.asarray(batch["ys"]), jnp.asarray(batch["labels"]),
        jnp.asarray(batch["olens"]), deterministic=True,
    )
    accum = 2
    tx, _ = build_optimizer(
        optimizer_params={"lr": 1e-3}, scheduler_params={"warmup_steps": 10},
        grad_norm=1.0, gradient_accumulate_steps=accum,
    )
    config = {"train_max_steps": 2, "log_interval_steps": 100,
              "eval_interval_steps": 0, "save_interval_steps": 0,
              "outdir": str(tmp_path / "exp"), "grad_norm": 1.0,
              "gradient_accumulate_steps": accum}
    trainer = ARVCTrainer(model, TrainState.create(params, tx),
                          {"Seq2SeqLoss": get_criterion("Seq2SeqLoss")},
                          config, loader, mesh=None, writer=False)
    trainer.run()
    assert trainer.steps == 2
    # 2 optimizer steps consumed accum * 2 micro-batches
    assert trainer._micro_total == 2 * accum
    # params only move at accumulation boundaries: optax.MultiSteps keeps
    # mini_step in opt state; after run it must be back at 0
    # materialize to host first — the jitted step donates the state buffers
    before = [np.asarray(x) for x in jax.tree_util.tree_leaves(trainer.state.params)]
    trainer._train_step(next(iter(loader)))  # one micro-step, no boundary yet
    assert trainer.steps == 2
    after = jax.tree_util.tree_leaves(trainer.state.params)
    for x, y in zip(before, after):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_log_interval_averages_over_micro_batches():
    """With gradient_accumulate_steps=N there are interval*N pending metric
    entries per log interval; the logged mean must be the micro-batch mean,
    not the micro-batch mean multiplied by N (round-2 bug: sums were divided
    by `interval` optimizer steps only)."""
    from collections import defaultdict
    from seq2seq_vc_tpu.train.trainer import Trainer

    class FakeWriter:
        def __init__(self):
            self.scalars = {}

        def add_scalar(self, key, value, step):
            self.scalars[key] = value

    t = object.__new__(Trainer)
    t.config = {"log_interval_steps": 2, "gradient_accumulate_steps": 3}
    t.steps = 2
    t.writer = FakeWriter()
    t.total_train_loss = defaultdict(float)
    t._interval_tick = 0.0
    t._step_costs = {}
    t._last_cost_key = None
    # 2 optimizer steps x 3 micro-batches, every micro-batch loss = 5.0
    t._pending_metrics = [{"loss": jnp.asarray(5.0)} for _ in range(6)]
    t._check_log_interval()
    assert t.writer.scalars["train/loss"] == pytest.approx(5.0)
    assert t._pending_metrics == []


def test_eval_is_deterministic(tmp_path):
    """Dev losses use deterministic=True (dropout off): eval_fn output is
    reproducible and differs from the train-mode (dropout-on) loss."""
    src, trg = _make_corpus(tmp_path, n=2)
    model = VTN(idim=80, odim=80, adim=32, aheads=2, elayers=1, eunits=64,
                dlayers=1, dunits=64, postnet_layers=0,
                dprenet_units=16, decoder_reduction_factor=2,
                # the Tacotron prenet's dropout is ALWAYS on (reference
                # semantics) — zero it so eval determinism is observable
                dprenet_dropout_rate=0.0,
                transformer_enc_dropout_rate=0.3,
                transformer_dec_dropout_rate=0.3)
    ds = ParallelVCMelDataset(src, trg)
    loader = DataLoader(ds, ARVCCollater(pad_multiple=8, reduction_factor=2),
                        batch_size=2, seed=0)
    batch = next(iter(loader))
    keys = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    params = model.init(
        keys, jnp.asarray(batch["xs"]), jnp.asarray(batch["ilens"]),
        jnp.asarray(batch["ys"]), jnp.asarray(batch["labels"]),
        jnp.asarray(batch["olens"]), deterministic=True,
    )
    tx, _ = build_optimizer(optimizer_params={"lr": 1e-3},
                            scheduler_params={"warmup_steps": 10})
    config = {"train_max_steps": 1, "log_interval_steps": 100,
              "eval_interval_steps": 0, "save_interval_steps": 0,
              "outdir": str(tmp_path / "exp")}
    trainer = ARVCTrainer(model, TrainState.create(params, tx),
                          {"Seq2SeqLoss": get_criterion("Seq2SeqLoss")},
                          config, loader, mesh=None, writer=False)
    arrays = trainer._array_batch(batch)
    eval_fn = trainer._get_eval_fn(trainer._flags())
    l1, _ = eval_fn(trainer.state.params, arrays, jax.random.PRNGKey(1))
    l2, _ = eval_fn(trainer.state.params, arrays, jax.random.PRNGKey(2))
    # deterministic=True: regular dropout off, so different rngs give
    # identical dev loss (prenet dropout zeroed above)
    train_loss, _ = trainer.loss_fn(
        trainer.state.params, arrays,
        {"dropout": jax.random.PRNGKey(1)}, trainer._flags(),
        deterministic=False,
    )
    det_loss, _ = trainer.loss_fn(
        trainer.state.params, arrays,
        {"dropout": jax.random.PRNGKey(1)}, trainer._flags(),
        deterministic=True,
    )
    assert float(det_loss) == pytest.approx(float(l1), rel=1e-5)
    assert float(train_loss) != pytest.approx(float(det_loss), rel=1e-6)
    assert float(l1) == pytest.approx(float(l2), rel=1e-6)


def test_trainer_save_and_resume(tmp_path):
    """Checkpoint -> resume restores params, optimizer state, and step count."""
    src, trg = _make_corpus(tmp_path, n=4)
    model = VTN(idim=80, odim=80, adim=32, aheads=2, elayers=1, eunits=64,
                dlayers=1, dunits=64, postnet_layers=2, postnet_chans=16,
                dprenet_units=16, decoder_reduction_factor=2)
    ds = ParallelVCMelDataset(src, trg)
    loader = DataLoader(ds, ARVCCollater(pad_multiple=8, reduction_factor=2),
                        batch_size=4, seed=0)
    batch = next(iter(loader))
    keys = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    params = model.init(
        keys, jnp.asarray(batch["xs"]), jnp.asarray(batch["ilens"]),
        jnp.asarray(batch["ys"]), jnp.asarray(batch["labels"]),
        jnp.asarray(batch["olens"]), deterministic=True,
    )
    tx, _ = build_optimizer(optimizer_params={"lr": 1e-3},
                            scheduler_params={"warmup_steps": 10}, grad_norm=1.0)
    config = {"train_max_steps": 3, "log_interval_steps": 100,
              "eval_interval_steps": 0, "save_interval_steps": 0,
              "outdir": str(tmp_path / "exp"), "grad_norm": 1.0}
    trainer = ARVCTrainer(model, TrainState.create(params, tx),
                          {"Seq2SeqLoss": get_criterion("Seq2SeqLoss")},
                          config, loader, mesh=None, writer=False)
    trainer.run()
    assert trainer.steps == 3
    ckpt = str(tmp_path / "exp" / "ck.ckpt")
    trainer.save_checkpoint(ckpt)

    trainer2 = ARVCTrainer(model, TrainState.create(params, tx),
                           {"Seq2SeqLoss": get_criterion("Seq2SeqLoss")},
                           dict(config, train_max_steps=5), loader,
                           mesh=None, writer=False)
    trainer2.load_checkpoint(ckpt)
    assert trainer2.steps == 3
    # params restored exactly
    a = jax.tree_util.tree_leaves(trainer.state.params)
    b = jax.tree_util.tree_leaves(trainer2.state.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    trainer2.run()  # continues to 5
    assert trainer2.steps == 5

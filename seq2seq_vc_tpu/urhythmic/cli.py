"""Urhythmic CLI entry points.

Capability match with the reference CLI scripts
(``urhythmic/urhythmic_{encode,segment,train_rhythm_model,
fine_tune_vocoder,convert,resample}.py``), as subcommands of
``python -m seq2seq_vc_tpu.urhythmic.cli <cmd>``. ``encode`` requires a
local HuBERT-soft checkpoint (the reference downloads it via torch.hub;
this image has no egress).
"""

from __future__ import annotations

import argparse
import logging
import os
import pickle

import numpy as np

from ..utils.audio import read_wav, write_wav
from ..utils.io import find_files, get_basename
from .model import UrhythmicFine, encode
from .rhythm_model import RhythmModelFineGrained
from .segmenter import Segmenter
from .stretcher import TimeStretcherFineGrained


def _load_hubert(checkpoint: str):
    """Torch-hub model ('hub'), raw torch module, or — the native path —
    any torch HuBERT-soft/HF-HuBERT checkpoint converted into the in-repo
    flax implementation (urhythmic/hubert.py)."""
    if checkpoint == "hub":
        import torch

        return torch.hub.load(
            "bshall/hubert:main", "hubert_soft", trust_repo=True
        ).eval()
    from .hubert import load_hubert_soft

    return load_hubert_soft(checkpoint)


def cmd_encode(args):
    hubert = _load_hubert(args.hubert_checkpoint)
    os.makedirs(os.path.join(args.out_dir, "soft"), exist_ok=True)
    os.makedirs(os.path.join(args.out_dir, "logprobs"), exist_ok=True)
    items = []
    for path in sorted(find_files(args.in_dir, "*.wav")):
        utt = get_basename(path)
        wav, sr = read_wav(path)
        assert sr == 16000, "urhythmic operates at 16 kHz"
        items.append((utt, wav))
    if isinstance(hubert, tuple):
        # native flax path: lengths-masked batched dispatches — same-bucket
        # utterances ride one (B, T) forward (exact valid-prefix semantics,
        # hubert.encode_batch), instead of one exact-length compile each
        from .hubert import conv_stack_frames, encode_batch

        model, params = hubert
        bucket = 16000  # 1 s sample quantum
        groups = {}
        for utt, wav in items:
            tb = ((len(wav) + bucket - 1) // bucket) * bucket
            groups.setdefault(tb, []).append((utt, wav))
        batch_size = int(getattr(args, "batch_size", 8) or 8)
        for tb, members in sorted(groups.items()):
            for i in range(0, len(members), batch_size):
                chunk = members[i : i + batch_size]
                wavs = np.zeros((len(chunk), tb), np.float32)
                lens = np.zeros((len(chunk),), np.int32)
                for bi, (_, w) in enumerate(chunk):
                    wavs[bi, : len(w)] = w
                    lens[bi] = len(w)
                pad = (400 - 320) // 2
                units, log_probs, _ = encode_batch(
                    model, params, wavs, bucket_samples=bucket, lengths=lens
                )
                for bi, (utt, w) in enumerate(chunk):
                    n = int(conv_stack_frames(len(w) + 2 * pad))
                    np.save(
                        os.path.join(args.out_dir, "soft", f"{utt}.npy"),
                        np.asarray(units[bi, :n]),
                    )
                    np.save(
                        os.path.join(args.out_dir, "logprobs", f"{utt}.npy"),
                        np.asarray(log_probs[bi, :n]),
                    )
        return
    for utt, wav in items:
        units, log_probs = encode(hubert, wav)
        np.save(os.path.join(args.out_dir, "soft", f"{utt}.npy"), units)
        np.save(os.path.join(args.out_dir, "logprobs", f"{utt}.npy"), log_probs)


def cmd_segment(args):
    with open(args.segmenter_checkpoint, "rb") as f:
        state = pickle.load(f)
    seg = Segmenter(num_clusters=3, gamma=args.gamma)
    seg.load_state_dict(state)
    os.makedirs(args.out_dir, exist_ok=True)
    for path in sorted(find_files(args.logprob_dir, "*.npy")):
        utt = get_basename(path)
        log_probs = np.load(path)
        clusters, boundaries = seg(log_probs)
        np.savez(
            os.path.join(args.out_dir, f"{utt}.npz"),
            segments=np.asarray([c.value for c in clusters]),
            boundaries=np.asarray(boundaries),
        )


def _load_segments(seg_dir):
    from .utils import SoundType

    utts = []
    for path in sorted(find_files(seg_dir, "*.npz")):
        data = np.load(path)
        clusters = [SoundType(int(v)) for v in data["segments"]]
        utts.append((clusters, list(data["boundaries"])))
    return utts


def cmd_train_rhythm_model(args):
    rm = RhythmModelFineGrained(hop_length=args.hop_length, sample_rate=args.sample_rate)
    if args.source_segments:
        rm.fit_source(_load_segments(args.source_segments))
    if args.target_segments:
        rm.fit_target(_load_segments(args.target_segments))
    with open(args.out_path, "wb") as f:
        pickle.dump(rm.state_dict(), f)
    logging.info("saved rhythm model to %s", args.out_path)


def cmd_fine_tune_vocoder(args):
    from .dataset import MelDataset
    from .vocoder_train import BATCH_SIZE, HifiganTrainer

    trainer = HifiganTrainer()
    dataset = MelDataset(args.wav_dir, args.unit_dir, train=True)
    if args.resume:
        first = next(dataset.batches(1))
        trainer.init_states(first["units"], first["wav"])
        trainer.load(args.resume, finetune=args.finetune)
    os.makedirs(args.checkpoint_dir, exist_ok=True)
    logging.info("fine-tuning on %d utterances", len(dataset))
    while trainer.steps < args.steps:
        for batch in dataset.batches(min(BATCH_SIZE, len(dataset))):
            metrics = trainer.train_step(batch["units"], batch["wav"])
            if trainer.steps % args.log_interval == 0:
                logging.info(
                    "step %d: gen=%.3f disc=%.3f mel=%.3f",
                    trainer.steps, metrics["loss_generator"],
                    metrics["loss_discriminator"], metrics["loss_mel"],
                )
            if trainer.steps % args.checkpoint_interval == 0:
                trainer.save(
                    os.path.join(args.checkpoint_dir, f"model-{trainer.steps}.ckpt")
                )
            if trainer.steps >= args.steps:
                break
    trainer.save(os.path.join(args.checkpoint_dir, f"model-{trainer.steps}.ckpt"))


def cmd_convert(args):
    import jax

    from ..vocoder.hifigan import HifiganGenerator, load_hifigan_backend

    with open(args.segmenter_checkpoint, "rb") as f:
        seg = Segmenter(num_clusters=3, gamma=args.gamma)
        seg.load_state_dict(pickle.load(f))
    rm = RhythmModelFineGrained()
    with open(args.rhythm_model_checkpoint, "rb") as f:
        rm.load_state_dict(pickle.load(f))
    vocoder_fn = load_hifigan_backend(args.vocoder_checkpoint, args.vocoder_config)
    system = UrhythmicFine(seg, rm, TimeStretcherFineGrained(), vocoder_fn)

    os.makedirs(args.out_dir, exist_ok=True)
    unit_files = sorted(find_files(os.path.join(args.in_dir, "soft"), "*.npy"))
    for upath in unit_files:
        utt = get_basename(upath)
        units = np.load(upath)
        log_probs = np.load(os.path.join(args.in_dir, "logprobs", f"{utt}.npy"))
        wav = system(units, log_probs)
        write_wav(os.path.join(args.out_dir, f"{utt}.wav"), wav, 16000)
        logging.info("converted %s (%d samples)", utt, len(wav))


def cmd_resample(args):
    from ..bin.preprocess import resample

    os.makedirs(args.out_dir, exist_ok=True)
    for path in sorted(find_files(args.in_dir, "*.wav")):
        wav, sr = read_wav(path)
        if wav.ndim > 1:
            wav = wav.mean(axis=1)
        out = resample(wav, sr, args.sample_rate)
        write_wav(os.path.join(args.out_dir, os.path.basename(path)), out, args.sample_rate)


def main():
    from ..core.cache import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser(description="Urhythmic rhythm conversion tools")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("encode")
    p.add_argument("--in-dir", required=True)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--hubert-checkpoint", default="hub")
    p.add_argument("--batch-size", type=int, default=8,
                   help="same-bucket utterances encoded per device dispatch")
    p.set_defaults(fn=cmd_encode)

    p = sub.add_parser("segment")
    p.add_argument("--logprob-dir", required=True)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--segmenter-checkpoint", required=True)
    p.add_argument("--gamma", type=float, default=2)
    p.set_defaults(fn=cmd_segment)

    p = sub.add_parser("train-rhythm-model")
    p.add_argument("--source-segments", default=None)
    p.add_argument("--target-segments", default=None)
    p.add_argument("--out-path", required=True)
    p.add_argument("--hop-length", type=int, default=320)
    p.add_argument("--sample-rate", type=int, default=16000)
    p.set_defaults(fn=cmd_train_rhythm_model)

    p = sub.add_parser("fine-tune-vocoder")
    p.add_argument("--wav-dir", required=True)
    p.add_argument("--unit-dir", required=True)
    p.add_argument("--checkpoint-dir", required=True)
    p.add_argument("--resume", default=None)
    p.add_argument("--finetune", action="store_true")
    p.add_argument("--steps", type=int, default=50000)
    p.add_argument("--log-interval", type=int, default=25)
    p.add_argument("--checkpoint-interval", type=int, default=10000)
    p.set_defaults(fn=cmd_fine_tune_vocoder)

    p = sub.add_parser("convert")
    p.add_argument("--in-dir", required=True, help="dir with soft/ and logprobs/")
    p.add_argument("--out-dir", required=True)
    p.add_argument("--segmenter-checkpoint", required=True)
    p.add_argument("--rhythm-model-checkpoint", required=True)
    p.add_argument("--vocoder-checkpoint", required=True)
    p.add_argument("--vocoder-config", default=None)
    p.add_argument("--gamma", type=float, default=2)
    p.set_defaults(fn=cmd_convert)

    p = sub.add_parser("resample")
    p.add_argument("--in-dir", required=True)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--sample-rate", type=int, default=16000)
    p.set_defaults(fn=cmd_resample)

    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)
    args.fn(args)


if __name__ == "__main__":
    main()

"""VC decoding driver.

Capability match with reference ``bin/vc_decode.py:32-376``: loads the
training config from the experiment dir, target stats, runs
``model.inference`` per utterance choosing the AR vs NAR path by registry
membership, logs mel-frames/sec, writes feature HDF5s, durations, and
vocoded wavs.

TPU-first: inputs are bucketed to padded lengths so the jitted inference
graph is reused across utterances (a handful of compiles instead of one
python loop step per frame per utterance as in the reference).
"""

from __future__ import annotations

import argparse
import logging
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from tqdm import tqdm

from ..core.checkpoint import load_checkpoint
from ..core.config import load_config
from ..dsp.stats import denormalize
from ..models import AR_VC_MODELS, NAR_VC_MODELS, get_model_class
from ..train.data import SourceVCMelDataset
from ..utils.io import read_hdf5, write_hdf5
from ..utils.audio import write_wav
from ..vocoder import get_vocoder
from .vc_train import init_model_params


def _bucket_len(n: int, multiple: int = 64) -> int:
    return ((n + multiple - 1) // multiple) * multiple


def main():
    from ..core.cache import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser(description="Decode with a trained VC model")
    parser.add_argument("--dumpdir", required=True, help="source features dir/scp")
    parser.add_argument("--trg-dumpdir", default=None,
                        help="target features (required for --use-teacher-forcing)")
    parser.add_argument("--dp-input-dir", default=None)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--config", default=None, help="defaults to <ckpt_dir>/config.yml")
    parser.add_argument("--outdir", required=True)
    parser.add_argument("--trg-stats", default=None)
    parser.add_argument("--feat-type", default="mel")
    parser.add_argument("--use-teacher-forcing", action="store_true")
    parser.add_argument("--batch-size", type=int, default=1,
                        help="decode N same-bucket utterances per TPU call "
                             "(the reference decodes one at a time)")
    parser.add_argument("--data-parallel", type=int, default=1,
                        help="shard each decode batch over N devices (batch "
                             "rows padded to a multiple of N; requires "
                             "--batch-size > 1)")
    parser.add_argument("--skip-plots", action="store_true",
                        help="skip mel/attention/stop-prob diagnostic plots")
    parser.add_argument("--verbose", type=int, default=1)
    args = parser.parse_args()

    logging.basicConfig(
        level=logging.INFO if args.verbose else logging.WARNING,
        format="%(asctime)s (%(module)s:%(lineno)d) %(levelname)s: %(message)s",
    )
    config_path = args.config or os.path.join(
        os.path.dirname(args.checkpoint), "config.yml"
    )
    config = load_config(config_path)

    trg_stats = None
    stats_path = args.trg_stats or config.get("trg_stats")
    if stats_path:
        trg_stats = {
            "mean": read_hdf5(stats_path, f"{args.feat_type}_mean"),
            "scale": read_hdf5(stats_path, f"{args.feat_type}_scale"),
        }

    if args.use_teacher_forcing:
        if not args.trg_dumpdir:
            raise ValueError("--use-teacher-forcing requires --trg-dumpdir")
        from ..train.data import ParallelVCMelDataset

        dataset = ParallelVCMelDataset(
            args.dumpdir, args.trg_dumpdir, dp_feats=args.dp_input_dir,
            feat_key=args.feat_type,
        )
    else:
        dataset = SourceVCMelDataset(
            args.dumpdir, dp_feats=args.dp_input_dir, feat_key=args.feat_type
        )
    logging.info("decoding %d utterances", len(dataset))

    model_type = config["model_type"]
    model_class = get_model_class(model_type)
    model = model_class(**config["model_params"])
    is_ar = model_type in AR_VC_MODELS
    assert is_ar or model_type in NAR_VC_MODELS

    # init + restore params
    first = dataset[0]
    d = first["src_feat"].shape[1]
    dummy = {
        "xs": np.zeros((1, 64, d), np.float32),
        "ilens": np.asarray([64], np.int32),
        "ys": np.zeros((1, 64, config["model_params"]["odim"]), np.float32),
        "olens": np.asarray([64], np.int32),
        "labels": np.zeros((1, 64), np.float32),
    }
    if "dp_input" in first:
        dummy["dp_inputs"] = np.zeros((1, 64, first["dp_input"].shape[1]), np.float32)
        dummy["dplens"] = np.asarray([64], np.int32)
    cfg_for_init = dict(config)
    cfg_for_init["collater_type"] = (
        "ARVCCollater" if is_ar else config.get("collater_type", "NARVCCollater")
    )
    params = init_model_params(model, cfg_for_init, dummy)
    params = load_checkpoint(args.checkpoint, params)["model"]
    # on-device once: host-numpy params passed as jit args re-upload the
    # whole weight set over the axon tunnel on EVERY batch (measured r5 at
    # serving: 15-30 s per call — see pipeline.Wav2WavConverter.__init__);
    # the --data-parallel branch below re-places them replicated on a mesh
    params = jax.device_put(params)

    vocoder = get_vocoder(config, trg_stats)
    inf_cfg = config.get("inference", {}) or {}

    inference = getattr(model_class, "inference")
    if is_ar and args.use_teacher_forcing:
        @jax.jit
        def run_tf(p, xs, ilens, ys, labels, olens, key):
            return model.apply(
                p, xs, ilens, ys, labels, olens, deterministic=True,
                rngs={"dropout": key},
            )
    if is_ar:
        # host-chunked AR decode with early exit: the KV cache covers the
        # full maxlenratio budget, but the device only runs chunks until
        # every item in the batch has stopped — the single-scan inference()
        # would burn the whole budget (mostly dead steps at maxlenratio 6+
        # for short utterances). The driver doubles chunk sizes (O(log)
        # host round trips; a handful of compiles served by the persistent
        # XLA cache) and speculatively dispatches the next chunk before
        # fetching the previous finished flags (models/ar_driver.py).
        from ..models.ar_driver import ChunkedARDecoder

        drv = ChunkedARDecoder(
            model, model_class,
            threshold=inf_cfg.get("threshold", 0.5),
            minlenratio=inf_cfg.get("minlenratio", 0.0),
            maxlenratio=inf_cfg.get("maxlenratio", 6.0),
            base_chunk=int(inf_cfg.get("decode_chunk_steps", 32)),
            max_chunk=int(inf_cfg.get("decode_max_chunk_steps", 256)),
        )
        # expected-length first dispatch (VC output length tracks input
        # length): decode_est_len_ratio 1.2 sizes the opening chunk to
        # ~1.2x the source frame count, usually finishing in 1-2 round
        # trips; 0 disables (pure geometric schedule)
        est_ratio = float(inf_cfg.get("decode_est_len_ratio", 1.2))
        r_dec = int(config["model_params"].get("decoder_reduction_factor", 1))

        def run(p, xs, ilens, key):
            est = 0
            if est_ratio > 0:
                est = int(np.ceil(est_ratio * float(np.max(np.asarray(ilens))) / r_dec))
            return drv(p, xs, ilens, key, est_steps=est)
    else:
        from functools import partial

        @partial(jax.jit, static_argnames=("max_out",))
        def run(p, xs, ilens, key, dp=None, max_out=512):
            return model.apply(
                p, xs, ilens, dp, max_output_frames=max_out,
                method=inference, rngs={"noise": key},
            )

    os.makedirs(args.outdir, exist_ok=True)
    wav_dir = os.path.join(args.outdir, "wav")
    os.makedirs(wav_dir, exist_ok=True)
    dur_dir = os.path.join(args.outdir, "durations")
    os.makedirs(dur_dir, exist_ok=True)

    # data-parallel decode: shard the batch axis over a device mesh; the
    # jitted programs propagate the sharding (pjit), so every decode batch
    # runs on all N chips with replicated params — multi-chip inference the
    # reference (single-GPU decode loop) has no counterpart for
    n_dp = max(1, int(args.data_parallel))
    dp_sharding = None
    if n_dp > 1:
        from jax.sharding import Mesh, NamedSharding
        from jax.sharding import PartitionSpec as P

        if args.batch_size < n_dp or args.batch_size % n_dp:
            raise ValueError("--batch-size must be a positive multiple of "
                             "--data-parallel")
        devs = jax.devices()
        if len(devs) < n_dp:
            raise ValueError(
                f"--data-parallel {n_dp} > available devices {len(devs)}"
            )
        mesh = Mesh(np.asarray(devs[:n_dp]), ("data",))
        dp_sharding = NamedSharding(mesh, P("data"))
        params = jax.device_put(params, NamedSharding(mesh, P()))

    def _shard_rows(arr, n_rows):
        """Pad the batch axis to a multiple of n_dp (repeat the last row)
        and place it sharded; returns (array, true_row_count)."""
        if dp_sharding is None:
            return jnp.asarray(arr), n_rows
        pad_rows = (-n_rows) % n_dp
        if pad_rows:
            arr = np.concatenate([arr] + [arr[-1:]] * pad_rows, axis=0)
        return jax.device_put(arr, dp_sharding), n_rows

    # group utterances into same-bucket batches so one compiled program
    # serves many utterances per TPU call
    if args.batch_size > 1 and not args.use_teacher_forcing:
        buckets = {}
        for idx in range(len(dataset)):
            T = dataset[idx]["src_feat"].shape[0]
            buckets.setdefault(_bucket_len(T), []).append(idx)
        order = [
            idxs[i : i + args.batch_size]
            for _, idxs in sorted(buckets.items())
            for i in range(0, len(idxs), args.batch_size)
        ]
        total_frames, total_sec = 0, 0.0
        for group in tqdm(order):
            items = [dataset[i] for i in group]
            Tb = _bucket_len(max(it["src_feat"].shape[0] for it in items))
            Bn = len(items)
            xs = np.zeros((Bn, Tb, items[0]["src_feat"].shape[1]), np.float32)
            ilens = np.zeros((Bn,), np.int32)
            for bi, it in enumerate(items):
                xs[bi, : it["src_feat"].shape[0]] = it["src_feat"]
                ilens[bi] = it["src_feat"].shape[0]
            dp = None
            if "dp_input" in items[0]:
                dp = np.zeros((Bn, Tb, items[0]["dp_input"].shape[1]), np.float32)
                for bi, it in enumerate(items):
                    dp[bi, : it["dp_input"].shape[0]] = it["dp_input"]
                dp, _ = _shard_rows(dp, Bn)
            key = jax.random.fold_in(
                jax.random.PRNGKey(config.get("seed", 0)), group[0]
            )
            xs_d, _ = _shard_rows(xs, Bn)
            ilens_d, _ = _shard_rows(ilens, Bn)
            start = time.time()
            if is_ar:
                out = run(params, xs_d, ilens_d, key)
            else:
                out = run(params, xs_d, ilens_d, key, dp, max_out=Tb * 2)
            out_lens = np.asarray(out["out_lens"])
            outs_all = np.asarray(out["outs"])
            elapsed = time.time() - start
            total_frames += int(out_lens.sum())
            total_sec += elapsed
            for bi, it in enumerate(items):
                utt = it["utt_id"]
                L = int(out_lens[bi])
                outs = outs_all[bi, :L]
                write_hdf5(os.path.join(args.outdir, f"{utt}.h5"), "feats",
                           outs.astype(np.float32))
                if not is_ar and "d_outs" in out:
                    # exact-length dump (padded text axis trimmed via d_lens)
                    dl = int(out["d_lens"][bi]) if "d_lens" in out else None
                    np.savetxt(os.path.join(dur_dir, f"{utt}.txt"),
                               np.asarray(out["d_outs"][bi][:dl], np.int64)[None],
                               fmt="%d")
                if not args.skip_plots:
                    from ..utils.plot import plot_1d, plot_2d, plot_attention

                    plot_2d(outs, os.path.join(args.outdir, "outs", f"{utt}.png"))
                    if is_ar:
                        plot_1d(np.asarray(out["probs"][bi, :L]),
                                os.path.join(args.outdir, "probs", f"{utt}_prob.png"))
                        plot_attention(
                            np.asarray(out["att_ws"][:, bi]),
                            os.path.join(args.outdir, "att_ws", f"{utt}_att_ws.png"),
                        )
                y = vocoder.decode(outs)
                write_wav(os.path.join(wav_dir, f"{utt}.wav"), y, vocoder.fs)
            logging.info("batch of %d: %d frames in %.3f s (%.1f frames/sec)",
                         Bn, int(out_lens.sum()), elapsed,
                         out_lens.sum() / max(elapsed, 1e-9))
        logging.info(
            "decode finished: %d frames in %.1f s (avg %.1f mel-frames/sec)",
            total_frames, total_sec, total_frames / max(total_sec, 1e-9),
        )
        return

    total_frames, total_sec = 0, 0.0
    for idx in tqdm(range(len(dataset))):
        item = dataset[idx]
        utt = item["utt_id"]
        feat = item["src_feat"]
        T = feat.shape[0]
        Tb = _bucket_len(T)
        xs = np.zeros((1, Tb, feat.shape[1]), np.float32)
        xs[0, :T] = feat
        ilens = jnp.asarray([T], jnp.int32)
        key = jax.random.fold_in(jax.random.PRNGKey(config.get("seed", 0)), idx)

        start = time.time()
        if is_ar and args.use_teacher_forcing:
            from ..utils.duration_calculator import calculate_durations

            trg = item["trg_feat"]
            r = config["model_params"].get("decoder_reduction_factor", 1)
            Lb = _bucket_len(trg.shape[0], int(np.lcm(64, r)))
            ys = np.zeros((1, Lb, trg.shape[1]), np.float32)
            ys[0, : trg.shape[0]] = trg
            olens = jnp.asarray([trg.shape[0]], jnp.int32)
            labels = np.zeros((1, Lb), np.float32)
            labels[0, trg.shape[0] - 1 :] = 1.0
            out_tf = run_tf(
                params, jnp.asarray(xs), ilens, jnp.asarray(ys),
                jnp.asarray(labels), olens, key,
            )
            L = int(out_tf["olens"][0])
            outs = np.asarray(out_tf["after_outs"][0, :L])
            # att_ws: (L, B, H, T_out_red, T_mem) -> (layers, heads, T, S)
            att = np.asarray(out_tf["att_ws"][:, 0])
            t_red = int(out_tf["olens_in"][0])
            s_len = int(out_tf["ilens_ds_st"][0])
            durations, focus = calculate_durations(att[:, :, :t_red, :s_len])
            logging.info("%s: focus rate = %.3f", utt, focus)
            np.savetxt(
                os.path.join(dur_dir, f"{utt}.txt"), durations[None], fmt="%d"
            )
            elapsed = time.time() - start
            total_frames += L
            total_sec += elapsed
            write_hdf5(os.path.join(args.outdir, f"{utt}.h5"), "feats", outs.astype(np.float32))
            if not args.skip_plots:
                from ..utils.plot import plot_2d, plot_attention

                plot_2d(outs, os.path.join(args.outdir, "outs", f"{utt}.png"))
                plot_attention(
                    att[:, :, :t_red, :s_len],
                    os.path.join(args.outdir, "att_ws", f"{utt}_att_ws.png"),
                )
            y = vocoder.decode(outs)
            write_wav(os.path.join(wav_dir, f"{utt}.wav"), y, vocoder.fs)
            continue
        if is_ar:
            out = run(params, jnp.asarray(xs), ilens, key)
        else:
            dp = None
            if "dp_input" in item:
                dparr = np.zeros((1, Tb, item["dp_input"].shape[1]), np.float32)
                dparr[0, : item["dp_input"].shape[0]] = item["dp_input"]
                dp = jnp.asarray(dparr)
            out = run(params, jnp.asarray(xs), ilens, key, dp, max_out=Tb * 2)
        L = int(out["out_lens"][0])
        outs = np.asarray(out["outs"][0, :L])
        elapsed = time.time() - start
        total_frames += L
        total_sec += elapsed
        logging.info("%s: %d frames in %.3f s (%.1f frames/sec)", utt, L, elapsed, L / max(elapsed, 1e-9))

        write_hdf5(os.path.join(args.outdir, f"{utt}.h5"), "feats", outs.astype(np.float32))
        if not is_ar and "d_outs" in out:
            dl = int(out["d_lens"][0]) if "d_lens" in out else None
            np.savetxt(
                os.path.join(dur_dir, f"{utt}.txt"),
                np.asarray(out["d_outs"][0][:dl], np.int64)[None],
                fmt="%d",
            )
        if not args.skip_plots:
            from ..utils.plot import plot_1d, plot_2d, plot_attention

            plot_2d(outs, os.path.join(args.outdir, "outs", f"{utt}.png"))
            if is_ar:
                plot_1d(np.asarray(out["probs"][0, :L]),
                        os.path.join(args.outdir, "probs", f"{utt}_prob.png"))
                plot_attention(
                    np.asarray(out["att_ws"][:, 0]),
                    os.path.join(args.outdir, "att_ws", f"{utt}_att_ws.png"),
                )
        y = vocoder.decode(outs)
        write_wav(os.path.join(wav_dir, f"{utt}.wav"), y, vocoder.fs)

    logging.info(
        "decode finished: %d frames in %.1f s (avg %.1f mel-frames/sec)",
        total_frames, total_sec, total_frames / max(total_sec, 1e-9),
    )


if __name__ == "__main__":
    main()

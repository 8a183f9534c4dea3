"""Objective evaluation driver.

Generic replacement for the reference's per-recipe ``egs/*/local/evaluate.py``
(~250 LoC each): computes MCD/F0RMSE/F0CORR/DDUR between converted and
ground-truth wavs (matched by utt id), parallelized over processes, with
optional ASR CER/WER when a local wav2vec2 checkpoint and transcripts are
provided. ``--gt-ceiling`` reproduces the reference's ground-truth ASR
baseline mode (``egs/l2-arctic/cascade/local/gt_evaluate.py``): CER/WER of
the ASR on the GROUND-TRUTH wavs themselves — the intelligibility ceiling
any conversion is compared against — skipping the signal metrics (GT vs GT
is trivially zero).
"""

from __future__ import annotations

import argparse
import logging
import multiprocessing as mp
import os
from typing import Dict

import numpy as np

from ..evaluate import calculate_mcd_f0, character_error_rate, word_error_rate
from ..utils.audio import read_wav
from ..utils.io import find_files, get_basename


def _evaluate_one(args):
    cvt_path, gt_path, fs, f0min, f0max = args
    cvt, fs1 = read_wav(cvt_path)
    gt, fs2 = read_wav(gt_path)
    assert fs1 == fs2 == fs, f"sampling rate mismatch for {cvt_path}"
    res = calculate_mcd_f0(gt, cvt, fs, f0min, f0max)
    res["utt_id"] = get_basename(cvt_path)
    return res


def main():
    from ..core.cache import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser(description="Objective evaluation (MCD/F0/DDUR)")
    parser.add_argument("--wavdir", required=True, help="converted wav dir")
    parser.add_argument("--gt-wavdir", required=True, help="ground truth wav dir")
    parser.add_argument("--f0min", type=float, default=100)
    parser.add_argument("--f0max", type=float, default=400)
    parser.add_argument("--f0-yaml", default=None,
                        help="per-speaker F0 range yaml (conf/f0.yaml); "
                             "overrides --f0min/--f0max")
    parser.add_argument("--spk", default=None,
                        help="speaker key into --f0-yaml (omit for a flat "
                             "single-speaker f0.yaml)")
    parser.add_argument("--fs", type=int, default=16000)
    parser.add_argument("--n-jobs", type=int, default=8)
    parser.add_argument("--transcription", default=None, help="2-col utt text file")
    parser.add_argument("--asr-model", default=None, help="local wav2vec2 dir")
    parser.add_argument("--out", default=None, help="optional results csv path")
    parser.add_argument(
        "--gt-ceiling", action="store_true",
        help="ASR CER/WER of the ground-truth wavs themselves (the "
             "intelligibility ceiling; reference gt_evaluate.py) — "
             "requires --transcription and --asr-model, skips MCD/F0",
    )
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO)
    if args.gt_ceiling:
        if not (args.transcription and args.asr_model):
            parser.error("--gt-ceiling requires --transcription and --asr-model")
        from ..evaluate.asr import ASRTranscriber
        from ..train.tts_data import read_2column_text

        texts = read_2column_text(args.transcription)
        asr = ASRTranscriber(args.asr_model)
        cers, wers, lines = [], [], []
        for p in sorted(find_files(args.gt_wavdir, "*.wav")):
            utt = get_basename(p)
            if utt not in texts:
                continue
            audio, sr = read_wav(p)
            hyp = asr.transcribe(audio, sr)
            cer = character_error_rate(hyp, texts[utt])
            wer = word_error_rate(hyp, texts[utt])
            cers.append(cer)
            wers.append(wer)
            lines.append(f"{utt} {cer:.4f} {wer:.4f}")
            logging.info("%s: CER %.1f%% WER %.1f%%", utt, 100 * cer, 100 * wer)
        logging.info(
            "GT ceiling mean CER/WER over %d utts: %.1f%% / %.1f%%",
            len(cers), 100 * float(np.mean(cers)), 100 * float(np.mean(wers)),
        )
        if args.out:
            os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
            with open(args.out, "w") as f:
                f.write("\n".join(lines) + "\n")
        return
    if args.f0_yaml:
        import yaml

        with open(args.f0_yaml) as f:
            ranges = yaml.safe_load(f)
        if args.spk is not None:
            ranges = ranges[args.spk]
        args.f0min = float(ranges["f0min"])
        args.f0max = float(ranges["f0max"])
        logging.info("F0 search range from %s: [%g, %g] Hz",
                     args.f0_yaml, args.f0min, args.f0max)
    cvt_wavs = sorted(find_files(args.wavdir, "*.wav"))
    gt_map = {get_basename(p): p for p in find_files(args.gt_wavdir, "*.wav")}
    pairs = [
        (p, gt_map[get_basename(p)], args.fs, args.f0min, args.f0max)
        for p in cvt_wavs
        if get_basename(p) in gt_map
    ]
    logging.info("evaluating %d utterance pairs", len(pairs))

    if args.n_jobs > 1:
        with mp.Pool(args.n_jobs) as pool:
            results = pool.map(_evaluate_one, pairs)
    else:
        results = [_evaluate_one(p) for p in pairs]

    metrics = ["MCD", "F0RMSE", "F0CORR", "DDUR"]
    lines = []
    for r in sorted(results, key=lambda r: r["utt_id"]):
        vals = " ".join(f"{r[m]:.4f}" for m in metrics)
        lines.append(f"{r['utt_id']} {vals}")
        logging.info("%s: %s", r["utt_id"], vals)
    means: Dict[str, float] = {
        m: float(np.nanmean([r[m] for r in results])) for m in metrics
    }
    logging.info(
        "Mean MCD, f0RMSE, f0CORR, DDUR: %.2f dB, %.2f Hz, %.3f, %.3f s",
        means["MCD"], means["F0RMSE"], means["F0CORR"], means["DDUR"],
    )

    if args.transcription and args.asr_model:
        from ..evaluate.asr import ASRTranscriber
        from ..train.tts_data import read_2column_text

        texts = read_2column_text(args.transcription)
        asr = ASRTranscriber(args.asr_model)
        cers, wers = [], []
        for p in cvt_wavs:
            utt = get_basename(p)
            if utt not in texts:
                continue
            audio, sr = read_wav(p)
            hyp = asr.transcribe(audio, sr)
            cers.append(character_error_rate(hyp, texts[utt]))
            wers.append(word_error_rate(hyp, texts[utt]))
        logging.info(
            "Mean CER/WER: %.1f%% / %.1f%%",
            100 * float(np.mean(cers)), 100 * float(np.mean(wers)),
        )

    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()

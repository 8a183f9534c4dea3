"""Preprocessing: wav -> features -> per-utt HDF5.

Capability match with reference ``bin/preprocess.py:95-314``: reads a
kaldi-style wav.scp, resamples, trims silence, applies global gain, writes
``wave`` + one dataset per feature type. The mel pipeline is the jitted
on-device extractor (``dsp/features.py``), so feature extraction runs on
TPU; silence trimming is a host-side RMS gate matching librosa.effects.trim
semantics.

Feature types: ``mel`` (jitted on-device extractor), ``encodec`` (native
flax SEANet port, ``encoders/encodec.py``), ``hubert`` (native flax
HuBERT-soft, ``urhythmic/hubert.py``), and ``ppg_sxliu`` (native conformer
ASR upstream + s3prl featurizer, ``encoders/ppg.py``) — each needs its
torch checkpoint path(s) in the config (no egress in this image).
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np
from tqdm import tqdm

from ..core.config import load_config
from ..dsp.features import LogMelExtractor
from ..utils.audio import read_wav
from ..utils.io import read_scp, write_hdf5


def resample(audio: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """Polyphase resampling via scipy (no librosa in this image)."""
    if orig_sr == target_sr:
        return audio
    from math import gcd

    from scipy.signal import resample_poly

    g = gcd(orig_sr, target_sr)
    return resample_poly(audio, target_sr // g, orig_sr // g).astype(np.float32)


def trim_silence(
    audio: np.ndarray,
    threshold_in_db: float = 60.0,
    frame_size: int = 2048,
    hop_size: int = 512,
) -> np.ndarray:
    """Trim leading/trailing silence (librosa.effects.trim semantics:
    drop edge frames whose RMS is more than top_db below the max RMS)."""
    if len(audio) < frame_size:
        return audio
    n = 1 + (len(audio) - frame_size) // hop_size
    idx = np.arange(n)[:, None] * hop_size + np.arange(frame_size)[None, :]
    rms = np.sqrt(np.mean(audio[idx] ** 2, axis=1))
    db = 20.0 * np.log10(np.maximum(rms, 1e-10))
    keep = db > (db.max() - threshold_in_db)
    if not keep.any():
        return audio
    first, last = np.argmax(keep), len(keep) - 1 - np.argmax(keep[::-1])
    start = first * hop_size
    end = min(len(audio), last * hop_size + frame_size)
    return audio[start:end]


def main():
    from ..core.cache import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser(description="Extract features from wav.scp")
    parser.add_argument("--wav-scp", "--scp", required=True)
    parser.add_argument("--segments", default=None)
    parser.add_argument("--dumpdir", required=True)
    parser.add_argument("--config", required=True)
    parser.add_argument("--verbose", type=int, default=1)
    args = parser.parse_args()

    logging.basicConfig(
        level=logging.INFO if args.verbose else logging.WARNING,
        format="%(asctime)s (%(module)s:%(lineno)d) %(levelname)s: %(message)s",
    )
    config = load_config(args.config)
    segments = None
    if args.segments:
        # kaldi segments: "utt_id rec_id start_sec end_sec" — utterances are
        # sliced out of the recordings named in wav.scp (reference
        # bin/preprocess.py uses kaldiio's segments-aware loader)
        segments = {}
        with open(args.segments) as f:
            for line in f:
                parts = line.split()
                if len(parts) != 4:
                    continue
                utt, rec, start, end = parts
                segments[utt] = (rec, float(start), float(end))

    sr = config["sampling_rate"]
    feat_list = config.get("feat_list", {"mel": {}})
    encodec = None
    if "encodec" in feat_list:
        # native SEANet EnCodec-24k encoder (reference utils/encodec.py uses
        # the external package; here the torch checkpoint is converted into
        # the flax port — see seq2seq_vc_tpu/encoders/encodec.py)
        ckpt = (feat_list["encodec"] or {}).get("checkpoint") or config.get(
            "encodec_checkpoint"
        )
        if not ckpt:
            raise ValueError(
                "feat_list.encodec needs `checkpoint:` (a torch EnCodec "
                "state_dict — HF transformers or facebookresearch naming); "
                "this image has no network access to auto-download one"
            )
        from ..encoders.encodec import EncodecEncoder, load_encodec

        import jax

        enc_model, enc_params = load_encodec(ckpt)
        encodec = (jax.jit(enc_model.apply), enc_params)
    hubert = None
    if "hubert" in feat_list:
        # native flax HuBERT (urhythmic/hubert.py): PPG-style hidden-layer
        # features (layer: N, 768-d) or soft units (feature: units, 256-d)
        # at 50 Hz — the TPU-native stand-in for the reference's s3prl
        # upstream+featurizer (bin/preprocess.py:184-196)
        hcfg = feat_list["hubert"] or {}
        ckpt = hcfg.get("checkpoint") or config.get("hubert_checkpoint")
        if not ckpt:
            raise ValueError(
                "feat_list.hubert needs `checkpoint:` (a torch HuBERT "
                "state_dict — HF transformers or bshall naming); this "
                "image has no network access to auto-download one"
            )
        from ..urhythmic.hubert import load_hubert_soft

        import jax

        hub_model, hub_params = load_hubert_soft(ckpt)
        layer = hcfg.get("layer")
        use_units = hcfg.get("feature", "layer") == "units"
        # lengths-masked forward: bucket-padded batches produce the
        # exact-length features on the valid prefix (masked instance-norm
        # stats + key-masked attention; see HubertSoft.encode) — without
        # the mask, padded keys perturb EVERY frame through the softmax
        if use_units:
            h_apply = jax.jit(
                lambda p, w, l: hub_model.apply(
                    p, w, lengths=l, method=type(hub_model).units
                )
            )
        else:
            h_apply = jax.jit(
                lambda p, w, l: hub_model.apply(
                    p, w, layer, lengths=l, method=type(hub_model).encode
                )
            )
        hubert = (h_apply, hub_params, use_units)
    ppg = None
    if "ppg_sxliu" in feat_list:
        # native conformer-ASR upstream + s3prl featurizer weights
        # (encoders/ppg.py replaces the reference's s3prl-vc + s3prl stack,
        # bin/preprocess.py:184-196). `checkpoint:` is the s3prl-vc
        # downstream ckpt carrying the trained featurizer (reference
        # semantics); `upstream_checkpoint:` is the PPG model weights file —
        # the reference auto-downloads it from the s3prl hub, which has no
        # native equivalent, so it must be given explicitly.
        pcfg = feat_list["ppg_sxliu"] or {}
        ckpt = pcfg.get("checkpoint")
        up_ckpt = pcfg.get("upstream_checkpoint")
        if not ckpt or not up_ckpt:
            raise ValueError(
                "feat_list.ppg_sxliu needs `checkpoint:` (s3prl-vc downstream "
                "ckpt with the trained featurizer) AND `upstream_checkpoint:` "
                "(the espnet-style PPG conformer weights; the reference "
                "downloads these from the s3prl hub — no egress here)"
            )
        from ..encoders.ppg import build_extractor

        ppg = build_extractor(
            up_ckpt, ckpt, sample_rate=16000,
            input_dim=pcfg.get("input_dim"),
        )
    unsupported = [
        k for k in feat_list if k not in ("mel", "encodec", "hubert", "ppg_sxliu")
    ]
    if unsupported:
        raise NotImplementedError(
            f"feature types {unsupported} need external encoders not present "
            "in this image; supported here: 'mel', 'encodec', 'hubert', "
            "'ppg_sxliu'"
        )
    extractor = LogMelExtractor(
        sampling_rate=sr,
        fft_size=config["fft_size"],
        hop_size=config["hop_size"],
        win_length=config.get("win_length"),
        window=config.get("window", "hann"),
        num_mels=config["num_mels"],
        fmin=config.get("fmin"),
        fmax=config.get("fmax"),
    )

    os.makedirs(args.dumpdir, exist_ok=True)
    scp = read_scp(args.wav_scp)
    if segments is not None:
        items = [
            (utt, scp[rec], (start, end))
            for utt, (rec, start, end) in segments.items()
            if rec in scp
        ]
    else:
        items = [(utt, path, None) for utt, path in scp.items()]
    for utt_id, wav_path, seg in tqdm(items):
        audio, orig_sr = read_wav(wav_path)
        if audio.ndim > 1:
            audio = audio.mean(axis=1)
        if seg is not None:
            start, end = seg
            audio = audio[int(start * orig_sr) : int(end * orig_sr)]
        audio = resample(audio, orig_sr, sr)
        if config.get("trim_silence", False):
            audio = trim_silence(
                audio,
                config.get("trim_threshold_in_db", 60),
                config.get("trim_frame_size", 2048),
                config.get("trim_hop_size", 512),
            )
        gain = config.get("global_gain_scale", 1.0)
        if gain != 1.0:
            audio = audio * gain
        if np.abs(audio).max() >= 1.0:
            logging.warning("%s causes clipping; reduce global_gain_scale", utt_id)

        mel = extractor(audio)
        # pad audio so len(audio) == len(mel) * hop (reference behavior)
        audio = np.pad(audio, (0, config["fft_size"]), mode="reflect")
        audio = audio[: len(mel) * config["hop_size"]]

        out = os.path.join(args.dumpdir, f"{utt_id}.h5")
        write_hdf5(out, "wave", audio.astype(np.float32))
        write_hdf5(out, "mel", mel.astype(np.float32))
        if encodec is not None:
            # reference preprocess.py:285-296: resample to the model rate
            # (24 kHz mono) and store the continuous encoder embeddings.
            # Pad to a 5120-sample bucket (16 encodec hops) so jit compiles
            # O(len/bucket) variants instead of one per utterance length.
            apply_fn, enc_params = encodec
            wav24 = resample(audio, sr, 24000)
            n_frames = int(np.ceil(len(wav24) / 320))
            bucket = 320 * 16
            padded = np.pad(wav24, (0, -len(wav24) % bucket))
            feat = np.asarray(apply_fn(enc_params, padded[None])[0], np.float32)
            write_hdf5(out, "encodec", feat[:n_frames])
        if hubert is not None:
            h_apply, hub_params, use_units = hubert
            wav16 = resample(audio, sr, 16000)
            # 20 ms hop, 25 ms window; units() pads 40 per side internally
            from ..urhythmic.hubert import conv_stack_frames

            eff = len(wav16) + (80 if use_units else 0)
            n_frames = max(int(conv_stack_frames(eff)), 1)
            bucket = 320 * 16
            padded = np.pad(wav16, (0, -len(wav16) % bucket))
            lens = np.asarray([len(wav16)], np.int32)
            feat = np.asarray(
                h_apply(hub_params, padded[None], lens)[0], np.float32
            )
            write_hdf5(out, "hubert", feat[:n_frames])
        if ppg is not None:
            wav16 = resample(audio, sr, 16000)
            write_hdf5(out, "ppg_sxliu", ppg(wav16).astype(np.float32))


if __name__ == "__main__":
    main()

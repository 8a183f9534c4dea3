"""TTS decoding driver (reference ``bin/tts_decode.py``): text -> token ids
-> TransformerTTS inference -> Griffin-Lim (or configured vocoder) -> wav."""

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
from ..models import TransformerTTS, get_model_class
from ..text import TextCleaner, TokenIDConverter, build_tokenizer
from ..train.tts_data import read_2column_text
from ..utils.audio import write_wav
from ..utils.io import read_hdf5, write_hdf5
from ..vocoder import get_vocoder


def main():
    from ..core.cache import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser(description="Decode with a trained TTS model")
    parser.add_argument("--text", required=True, help="2-column utt-id text file")
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--config", default=None)
    parser.add_argument("--token-list", required=True)
    parser.add_argument("--cleaner", default="tacotron")
    parser.add_argument("--g2p", default=None)
    parser.add_argument("--token-type", default="char")
    parser.add_argument("--stats", default=None, help="mel stats for denorm")
    parser.add_argument("--feat-type", default="mel")
    parser.add_argument("--outdir", required=True)
    parser.add_argument("--verbose", type=int, default=1)
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO if args.verbose else logging.WARNING)
    config_path = args.config or os.path.join(
        os.path.dirname(args.checkpoint), "config.yml"
    )
    config = load_config(config_path)

    with open(args.token_list, encoding="utf-8") as f:
        token_list = [line.rstrip("\n") for line in f if line.strip()]
    cleaner = TextCleaner(args.cleaner) if args.cleaner else None
    tokenizer = build_tokenizer(token_type=args.token_type, g2p_type=args.g2p)
    converter = TokenIDConverter(token_list, unk_symbol="<unk>")

    model_params = dict(config["model_params"])
    model_params["idim"] = len(token_list)
    model_class = get_model_class(config.get("model_type", "TransformerTTS"))
    model = model_class(**model_params)

    dummy_x = np.zeros((1, 16), np.int32)
    dummy_y = np.zeros((1, 32, model_params["odim"]), np.float32)

    def _init(x, y, seed):
        keys = {
            "params": jax.random.PRNGKey(seed),
            "dropout": jax.random.PRNGKey(seed + 1),
        }
        return model.init(
            keys, x, np.asarray([16], np.int32), y, np.zeros((1, 32), np.float32),
            np.asarray([32], np.int32), deterministic=True,
        )

    params = jax.jit(_init)(dummy_x, dummy_y, 0)
    params = load_checkpoint(args.checkpoint, params)["model"]
    # resident weights: no per-batch re-upload over the tunnel (r5)
    params = jax.device_put(params)

    stats = None
    if args.stats:
        stats = {
            "mean": read_hdf5(args.stats, f"{args.feat_type}_mean"),
            "scale": read_hdf5(args.stats, f"{args.feat_type}_scale"),
        }
    vocoder = get_vocoder(config, stats)
    inf_cfg = config.get("inference", {}) or {}

    # chunked AR decode with host early exit (models/ar_driver.py): the
    # device only runs geometric chunks until the batch stops, instead of
    # the full maxlenratio-10 budget the single-scan inference() pays
    from ..models.ar_driver import ChunkedARDecoder

    run = ChunkedARDecoder(
        model, model_class,
        threshold=inf_cfg.get("threshold", 0.5),
        minlenratio=inf_cfg.get("minlenratio", 0.0),
        maxlenratio=inf_cfg.get("maxlenratio", 10.0),
        base_chunk=int(inf_cfg.get("decode_chunk_steps", 32)),
        max_chunk=int(inf_cfg.get("decode_max_chunk_steps", 256)),
    )

    texts = read_2column_text(args.text)
    os.makedirs(args.outdir, exist_ok=True)
    wav_dir = os.path.join(args.outdir, "wav")
    os.makedirs(wav_dir, exist_ok=True)

    for idx, (utt, text) in enumerate(tqdm(texts.items())):
        if cleaner is not None:
            text = cleaner(text)
        ids = converter.tokens2ids(tokenizer.text2tokens(text))
        T = len(ids)
        Tb = ((T + 15) // 16) * 16
        xs = np.zeros((1, Tb), np.int32)
        xs[0, :T] = ids
        start = time.time()
        out = run(
            params, jnp.asarray(xs), jnp.asarray([T], jnp.int32),
            jax.random.fold_in(jax.random.PRNGKey(0), idx),
        )
        L = int(out["out_lens"][0])
        feats = np.asarray(out["outs"][0, :L])
        logging.info("%s: %d frames in %.2f s", utt, L, time.time() - start)
        write_hdf5(os.path.join(args.outdir, f"{utt}.h5"), "feats", feats)
        y = vocoder.decode(feats)
        write_wav(os.path.join(wav_dir, f"{utt}.wav"), y, vocoder.fs)


if __name__ == "__main__":
    main()

"""bin/tts_decode CLI end-to-end on CPU: text file -> chunked AR decode
(ChunkedARDecoder driver) -> Griffin-Lim -> wav + h5 artifacts.

Pins the full wiring of the decode entry point (reference
``bin/tts_decode.py``): tokenizer/cleaner/converter construction, checkpoint
restore into an initialized template, the early-exit chunked decode path,
and vocoder dispatch (Griffin-Lim fallback runs on the host CPU backend)."""

import os
import sys

import jax
import numpy as np
import yaml


def test_tts_decode_cli_end_to_end(tmp_path, monkeypatch):
    from seq2seq_vc_tpu.bin.tts_decode import main
    from seq2seq_vc_tpu.core.checkpoint import save_checkpoint
    from seq2seq_vc_tpu.models import TransformerTTS

    token_list = ["<blank>", "<unk>"] + list("abcdefgh") + ["<space>", "<sos/eos>"]
    token_file = os.path.join(tmp_path, "tokens.txt")
    with open(token_file, "w") as f:
        f.write("\n".join(token_list) + "\n")

    model_params = dict(
        odim=20, adim=32, aheads=2, elayers=1, eunits=64, dlayers=1,
        dunits=64, postnet_layers=2, postnet_chans=16, postnet_filts=5,
        dprenet_layers=1, dprenet_units=16, decoder_reduction_factor=1,
    )
    config = {
        "sampling_rate": 16000,
        "fft_size": 256,
        "hop_size": 128,
        "num_mels": 20,
        "fmin": 80,
        "fmax": 7600,
        "model_type": "TransformerTTS",
        "model_params": model_params,
        "inference": {
            "threshold": 0.5, "minlenratio": 0.0, "maxlenratio": 3.0,
            "decode_chunk_steps": 8, "decode_max_chunk_steps": 16,
        },
    }
    cfg_path = os.path.join(tmp_path, "config.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(config, f)

    model = TransformerTTS(idim=len(token_list), **model_params)
    x = np.zeros((1, 16), np.int32)
    y = np.zeros((1, 32, 20), np.float32)
    keys = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    params = model.init(
        keys, x, np.asarray([16], np.int32), y, np.zeros((1, 32), np.float32),
        np.asarray([32], np.int32), deterministic=True,
    )
    ckpt = os.path.join(tmp_path, "checkpoint-1steps.ckpt")
    save_checkpoint(ckpt, params, {}, 1, 1)

    text_file = os.path.join(tmp_path, "text")
    with open(text_file, "w") as f:
        f.write("utt1 abc de\nutt2 hg fed\n")

    outdir = os.path.join(tmp_path, "out")
    argv = [
        "tts_decode",
        "--text", text_file,
        "--checkpoint", ckpt,
        "--config", cfg_path,
        "--token-list", token_file,
        "--cleaner", "",
        "--token-type", "char",
        "--outdir", outdir,
    ]
    monkeypatch.setattr(sys, "argv", argv)
    main()

    for utt in ("utt1", "utt2"):
        assert os.path.exists(os.path.join(outdir, f"{utt}.h5")), utt
        wav = os.path.join(outdir, "wav", f"{utt}.wav")
        assert os.path.exists(wav), utt
        from seq2seq_vc_tpu.utils.audio import read_wav

        audio, sr = read_wav(wav)
        assert sr == 16000 and len(audio) > 0

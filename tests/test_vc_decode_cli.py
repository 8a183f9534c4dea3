"""bin/vc_decode CLI end-to-end on CPU with the diffsinger AASVC decoder:
features dir -> NAR inference (DDIM sampling) -> Griffin-Lim -> wav + h5.

Pins the decode entry point's wiring for the diffusion decoder branch
(registry dispatch, checkpoint restore, jitted bucketed inference with the
'noise' rng stream, vocoder fallback)."""

import os
import sys

import jax
import numpy as np
import yaml

from seq2seq_vc_tpu.utils import write_hdf5


def _setup_and_run(tmp_path, monkeypatch, extra_argv=()):
    from seq2seq_vc_tpu.bin.vc_decode import main
    from seq2seq_vc_tpu.bin.vc_train import init_model_params
    from seq2seq_vc_tpu.core.checkpoint import save_checkpoint
    from seq2seq_vc_tpu.models import AASVC

    d = 20
    dump = tmp_path / "dump"
    rng = np.random.default_rng(0)
    for i in range(3):
        T = 20 + 8 * i
        write_hdf5(
            str(dump / f"utt{i}.h5"), "feats",
            rng.standard_normal((T, d)).astype(np.float32),
        )

    model_params = dict(
        idim=d, odim=d, adim=16, aheads=2, elayers=1, eunits=32,
        dlayers=1, dunits=32, postnet_layers=0,
        post_encoder_reduction_factor=2, decoder_reduction_factor=2,
        duration_predictor_type="deterministic",
        conformer_enc_kernel_size=7, conformer_dec_kernel_size=7,
        decoder_type="diffsinger",
        diffsinger_denoiser_residual_channels=8,
        diffsinger_diffusion_steps=4,
        diffsinger_inference_steps=2,
    )
    config = {
        "sampling_rate": 16000,
        "fft_size": 256,
        "hop_size": 128,
        "num_mels": d,
        "fmin": 80,
        "fmax": 7600,
        "model_type": "AASVC",
        "model_params": model_params,
        "collater_type": "NARVCCollater",
        "inference": {},
    }
    exp = tmp_path / "exp"
    os.makedirs(exp)
    with open(exp / "config.yml", "w") as f:
        yaml.safe_dump(config, f)

    model = AASVC(**model_params)
    dummy = {
        "xs": np.zeros((1, 64, d), np.float32),
        "ilens": np.asarray([64], np.int32),
        "ys": np.zeros((1, 64, d), np.float32),
        "olens": np.asarray([64], np.int32),
    }
    params = init_model_params(model, config, dummy)
    ckpt = str(exp / "checkpoint-1steps.ckpt")
    save_checkpoint(ckpt, params, {}, 1, 1)

    outdir = tmp_path / "results"
    argv = [
        "vc_decode",
        "--dumpdir", str(dump),
        "--checkpoint", ckpt,
        "--outdir", str(outdir),
        "--feat-type", "feats",
        "--skip-plots",
        *extra_argv,
    ]
    monkeypatch.setattr(sys, "argv", argv)
    main()
    return outdir


def test_vc_decode_cli_diffsinger(tmp_path, monkeypatch):
    outdir = _setup_and_run(tmp_path, monkeypatch)
    for utt in ("utt0", "utt1", "utt2"):
        assert os.path.exists(outdir / f"{utt}.h5"), utt
        assert os.path.exists(outdir / "wav" / f"{utt}.wav"), utt


def test_vc_decode_cli_data_parallel(tmp_path, monkeypatch):
    """--data-parallel 2 shards the decode batch over the fake CPU mesh
    (conftest provides 8 devices); artifacts come out for every utterance
    (incl. a partial final batch padded to the mesh multiple)."""
    outdir = _setup_and_run(
        tmp_path, monkeypatch,
        extra_argv=["--batch-size", "2", "--data-parallel", "2"],
    )
    for utt in ("utt0", "utt1", "utt2"):
        assert os.path.exists(outdir / f"{utt}.h5"), utt
        assert os.path.exists(outdir / "wav" / f"{utt}.wav"), utt

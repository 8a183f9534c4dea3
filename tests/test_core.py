"""Core config / mesh / IO tests."""

import argparse
import os

import jax
import numpy as np
import jax.numpy as jnp

from seq2seq_vc_tpu.core import load_config, merge_args, dump_config
from seq2seq_vc_tpu.parallel import get_mesh, shard_batch, data_sharding
from seq2seq_vc_tpu.utils import (
    read_hdf5,
    write_hdf5,
    HDF5ScpLoader,
    read_scp,
    find_files,
    read_wav,
    write_wav,
)


def test_config_merge_and_dump(tmp_path):
    cfg_path = tmp_path / "conf.yaml"
    cfg_path.write_text("model_type: VTN\nbatch_size: 16\n")
    overlay = tmp_path / "extra.yaml"
    overlay.write_text("batch_size: 4\nfreeze_mods: [decoder]\n")
    config = load_config(str(cfg_path))
    args = argparse.Namespace(outdir=str(tmp_path), resume="")
    config = merge_args(config, args, additional_config=str(overlay))
    assert config["model_type"] == "VTN"
    assert config["batch_size"] == 4
    assert config["outdir"] == str(tmp_path)
    out = dump_config(config, str(tmp_path / "exp"), version="0.1.0")
    reloaded = load_config(out)
    assert reloaded["version"] == "0.1.0"
    assert reloaded["freeze_mods"] == ["decoder"]


def test_mesh_and_batch_sharding():
    assert len(jax.devices()) == 8, "conftest must fake 8 CPU devices"
    mesh = get_mesh()
    assert mesh.shape == {"data": 8, "model": 1, "seq": 1, "pipe": 1}
    batch = {"x": jnp.zeros((16, 10, 4)), "lens": jnp.ones((16,), jnp.int32)}
    sharded = shard_batch(batch, mesh)
    assert sharded["x"].sharding == data_sharding(mesh)

    def step(b):
        return jnp.sum(b["x"]) + jnp.sum(b["lens"])

    out = jax.jit(step)(sharded)
    assert out == 16


def test_hdf5_roundtrip_and_scp(tmp_path):
    arr = np.arange(12, dtype=np.float32).reshape(3, 4)
    h5 = str(tmp_path / "a.h5")
    write_hdf5(h5, "feats", arr)
    write_hdf5(h5, "wave", np.zeros(5, np.float32))
    np.testing.assert_array_equal(read_hdf5(h5, "feats"), arr)
    scp = tmp_path / "feats.scp"
    scp.write_text(f"utt1 {h5}:feats\nutt2 {h5}\n")
    loader = HDF5ScpLoader(str(scp))
    np.testing.assert_array_equal(loader["utt1"], arr)
    np.testing.assert_array_equal(loader["utt2"], arr)
    assert list(read_scp(str(scp))) == ["utt1", "utt2"]


def test_wav_roundtrip(tmp_path):
    sr = 16000
    audio = 0.5 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr).astype(np.float32)
    path = str(tmp_path / "x.wav")
    write_wav(path, audio, sr)
    back, sr2 = read_wav(path)
    assert sr2 == sr
    np.testing.assert_allclose(back, audio, atol=1e-3)
    assert find_files(str(tmp_path), "*.wav") == [path]

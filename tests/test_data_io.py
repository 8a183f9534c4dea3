"""kaldi ark scp loading, metadata-only length index, and the multi-host
data path (per-process batch slicing + global-bucket padding +
make_array_from_process_local_data assembly)."""

import jax
import numpy as np

from seq2seq_vc_tpu.parallel import get_mesh
from seq2seq_vc_tpu.parallel.mesh import data_sharding, shard_batch
from seq2seq_vc_tpu.train.data import (
    ARVCCollater,
    DataLoader,
    ParallelVCMelDataset,
    _make_loader,
)
from seq2seq_vc_tpu.utils import write_hdf5
from seq2seq_vc_tpu.utils.io import KaldiArkScpLoader, write_kaldi_ark


def test_kaldi_ark_scp_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    arrays = {
        f"utt{i}": rng.standard_normal((10 + i, 5)).astype(np.float32)
        for i in range(4)
    }
    scp_map = write_kaldi_ark(str(tmp_path / "feats.ark"), arrays)
    scp = tmp_path / "feats.scp"
    scp.write_text("".join(f"{u} {v}\n" for u, v in scp_map.items()))

    loader = _make_loader(str(scp))
    assert isinstance(loader, KaldiArkScpLoader)
    assert sorted(loader.keys()) == sorted(arrays.keys())
    for utt, want in arrays.items():
        np.testing.assert_array_equal(loader[utt], want)


def _corpus(tmp_path, n=8, d=6):
    rng = np.random.default_rng(1)
    src, trg = tmp_path / "src", tmp_path / "trg"
    lens = {}
    for i in range(n):
        T, L = 10 + 3 * i, 12 + 5 * i
        write_hdf5(str(src / f"u{i}.h5"), "feats",
                   rng.standard_normal((T, d)).astype(np.float32))
        write_hdf5(str(trg / f"u{i}.h5"), "feats",
                   rng.standard_normal((L, d)).astype(np.float32))
        lens[f"u{i}"] = (T, L)
    return str(src), str(trg), lens


def test_metadata_length_index(tmp_path):
    src, trg, lens = _corpus(tmp_path)
    ds = ParallelVCMelDataset(src, trg)
    for i, utt in enumerate(ds.utt_ids):
        assert ds.length(i, "src_feat") == lens[utt][0]
        assert ds.length(i, "trg_feat") == lens[utt][1]


def test_multihost_loader_slices_and_global_padding(tmp_path):
    """Two simulated processes: each sees half the rows of every global
    batch, padded to the same global bucket; assembled global arrays match
    the single-host batch up to row permutation."""
    src, trg, _ = _corpus(tmp_path, n=8)
    ds = ParallelVCMelDataset(src, trg)
    coll = ARVCCollater(pad_multiple=8, reduction_factor=2)

    single = list(DataLoader(ds, coll, batch_size=4, shuffle=False, prefetch=0))
    parts = [
        list(DataLoader(ds, coll, batch_size=4, shuffle=False, prefetch=0,
                        process_index=p, process_count=2))
        for p in range(2)
    ]
    assert len(parts[0]) == len(parts[1]) == len(single)
    for bi, ref in enumerate(single):
        locs = [parts[p][bi] for p in range(2)]
        # same global padded length on every process
        assert locs[0]["ys"].shape[1] == locs[1]["ys"].shape[1] == ref["ys"].shape[1]
        assert locs[0]["xs"].shape[1] == locs[1]["xs"].shape[1] == ref["xs"].shape[1]
        # strided row split covers the global batch exactly
        got_utts = sorted(locs[0]["utt_ids"] + locs[1]["utt_ids"])
        assert got_utts == sorted(ref["utt_ids"])
        # global assembly (process-local shards concatenated) is a row
        # permutation of the single-host batch
        glob = np.concatenate([locs[0]["xs"], locs[1]["xs"]])
        order = np.argsort([u for p in range(2) for u in locs[p]["utt_ids"]])
        ref_order = np.argsort(ref["utt_ids"])
        np.testing.assert_allclose(glob[order], ref["xs"][ref_order])


def test_shard_batch_on_mesh(tmp_path):
    mesh = get_mesh(data=8)
    batch = {
        "xs": np.ones((8, 16, 4), np.float32),
        "ilens": np.arange(8, dtype=np.int32),
    }
    out = shard_batch(batch, mesh)
    assert out["xs"].sharding.is_equivalent_to(data_sharding(mesh), 3)
    np.testing.assert_array_equal(np.asarray(out["ilens"]), batch["ilens"])
    # single-process global assembly path used by multi-host shard_batch
    arr = jax.make_array_from_process_local_data(
        data_sharding(mesh), batch["xs"]
    )
    np.testing.assert_array_equal(np.asarray(arr), batch["xs"])
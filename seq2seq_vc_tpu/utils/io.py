"""Filesystem / HDF5 / kaldi-scp I/O.

Capability parity with reference ``seq2seq_vc/utils/utils.py:24-260``
(``find_files``, ``read_hdf5``, ``write_hdf5``, ``HDF5ScpLoader``,
``NpyScpLoader``); fresh implementation on h5py/numpy.

Scp format: each line is ``<utt_id> <path>[:dset[,dset2,...]]``. HDF5
entries may name one or more datasets inside the file; multiple datasets
are concatenated along the feature axis.
"""

from __future__ import annotations

import fnmatch
import os
from typing import Dict, List

import h5py
import numpy as np


def get_basename(path: str) -> str:
    return os.path.splitext(os.path.basename(path))[0]


def find_files(root_dir: str, query: str = "*.wav", include_root_dir: bool = True) -> List[str]:
    """Recursively find files matching ``query`` under ``root_dir``."""
    found = []
    for root, _, filenames in os.walk(root_dir, followlinks=True):
        for filename in fnmatch.filter(filenames, query):
            found.append(os.path.join(root, filename))
    if not include_root_dir:
        prefix = root_dir.rstrip("/") + "/"
        found = [f[len(prefix):] if f.startswith(prefix) else f for f in found]
    return found


def read_hdf5(hdf5_name: str, hdf5_path: str):
    """Read one dataset from an HDF5 file."""
    with h5py.File(hdf5_name, "r") as f:
        if hdf5_path not in f:
            raise KeyError(f"no dataset {hdf5_path!r} in {hdf5_name}")
        return f[hdf5_path][()]


def write_hdf5(hdf5_name: str, hdf5_path: str, write_data, is_overwrite: bool = True) -> None:
    """Write one dataset into an HDF5 file (creating parents as needed)."""
    write_data = np.asarray(write_data)
    dirname = os.path.dirname(hdf5_name)
    if dirname:
        os.makedirs(dirname, exist_ok=True)
    mode = "r+" if os.path.exists(hdf5_name) else "w"
    with h5py.File(hdf5_name, mode) as f:
        if hdf5_path in f:
            if not is_overwrite:
                raise FileExistsError(f"{hdf5_path!r} already in {hdf5_name}")
            del f[hdf5_path]
        f.create_dataset(hdf5_path, data=write_data)


def read_scp(scp_path: str) -> Dict[str, str]:
    """Read a kaldi-style scp file into an ordered {utt_id: value} dict."""
    data: Dict[str, str] = {}
    with open(scp_path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            key, value = line.split(maxsplit=1)
            data[key] = value
    return data


def load_scp_entry(value: str, default_hdf5_path: str = "feats") -> np.ndarray:
    """Load an array from one scp value (hdf5-with-dset, bare hdf5, or npy)."""
    if value.endswith(".npy"):
        return np.load(value)
    if ":" in value:
        path, dsets = value.split(":", 1)
        arrays = [read_hdf5(path, d) for d in dsets.split(",")]
        arrays = [a if a.ndim != 1 else a.reshape(-1, 1) for a in arrays]
        return arrays[0] if len(arrays) == 1 else np.concatenate(arrays, axis=1)
    return read_hdf5(value, default_hdf5_path)


class _ScpLoader:
    """Dict-like lazy loader over an scp file."""

    def __init__(self, feats_scp: str):
        self.data = read_scp(feats_scp)

    def get_path(self, key: str) -> str:
        return self.data[key]

    def __len__(self):
        return len(self.data)

    def __iter__(self):
        return iter(self.data)

    def keys(self):
        return self.data.keys()

    def values(self):
        for key in self.keys():
            yield self[key]


class HDF5ScpLoader(_ScpLoader):
    """Lazy loader for an scp of HDF5 entries."""

    def __init__(self, feats_scp: str, default_hdf5_path: str = "feats"):
        super().__init__(feats_scp)
        self.default_hdf5_path = default_hdf5_path

    def __getitem__(self, key: str) -> np.ndarray:
        return load_scp_entry(self.data[key], self.default_hdf5_path)

    def length(self, key: str) -> int:
        """Row count from HDF5 metadata only (no data read)."""
        value = self.data[key]
        if ":" in value and not value.endswith(".npy"):
            path, dsets = value.split(":", 1)
            dset = dsets.split(",")[0]
        else:
            path, dset = value, self.default_hdf5_path
        with h5py.File(path, "r") as f:
            return int(f[dset].shape[0])


class NpyScpLoader(_ScpLoader):
    """Lazy loader for an scp of .npy paths."""

    def __getitem__(self, key: str) -> np.ndarray:
        return np.load(self.data[key])

    def length(self, key: str) -> int:
        """Row count without loading the data (mmap header read)."""
        return int(np.load(self.data[key], mmap_mode="r").shape[0])


def _read_kaldi_matrix(f) -> np.ndarray:
    """Read one kaldi binary matrix at the current file offset.

    Layout (what kaldiio/kaldi write for an scp-addressed entry): a "\\0B"
    binary marker, a "FM "/"DM " type token, then per dimension a size byte
    (4) + little-endian int32, then row-major payload. Compressed matrices
    (CM*) are not supported — re-dump uncompressed.
    """
    marker = f.read(2)
    if marker != b"\x00B":
        raise ValueError(f"not a kaldi binary entry (marker {marker!r})")
    token = b""
    while not token.endswith(b" "):
        c = f.read(1)
        if not c:
            raise EOFError("truncated kaldi matrix header")
        token += c
    kind = token.strip().decode()
    if kind not in ("FM", "DM"):
        raise NotImplementedError(
            f"kaldi matrix type {kind!r} unsupported (only FM/DM; "
            "compressed CM matrices must be re-dumped uncompressed)"
        )
    dims = []
    for _ in range(2):
        size = f.read(1)
        if size != b"\x04":
            raise ValueError("unexpected kaldi int size byte")
        dims.append(int.from_bytes(f.read(4), "little", signed=True))
    rows, cols = dims
    dtype = np.float32 if kind == "FM" else np.float64
    data = np.frombuffer(f.read(rows * cols * dtype().itemsize), dtype=dtype)
    return data.reshape(rows, cols)


def write_kaldi_ark(ark_path: str, arrays: Dict[str, np.ndarray]) -> Dict[str, str]:
    """Write a binary kaldi ark of float32 matrices.

    Returns {utt_id: "path:offset"} scp values addressing each entry (the
    reference consumes these via kaldiio; here they feed KaldiArkScpLoader).
    """
    scp: Dict[str, str] = {}
    dirname = os.path.dirname(ark_path)
    if dirname:
        os.makedirs(dirname, exist_ok=True)
    with open(ark_path, "wb") as f:
        for utt, arr in arrays.items():
            arr = np.ascontiguousarray(arr, np.float32)
            f.write(utt.encode() + b" ")
            offset = f.tell()
            f.write(b"\x00BFM ")
            for d in arr.shape:
                f.write(b"\x04" + int(d).to_bytes(4, "little", signed=True))
            f.write(arr.tobytes())
            scp[utt] = f"{ark_path}:{offset}"
    return scp


class KaldiArkScpLoader(_ScpLoader):
    """Lazy loader for an scp of kaldi ark entries (``path.ark:offset``).

    Native replacement for the reference's kaldiio scp sniffing
    (``datasets/dataset.py:21-45``); no kaldiio dependency.
    """

    def __getitem__(self, key: str) -> np.ndarray:
        path, offset = self.data[key].rsplit(":", 1)
        with open(path, "rb") as f:
            f.seek(int(offset))
            return _read_kaldi_matrix(f)

from .io import (  # noqa: F401
    find_files,
    get_basename,
    read_hdf5,
    write_hdf5,
    HDF5ScpLoader,
    NpyScpLoader,
    read_scp,
    load_scp_entry,
)
from .audio import read_wav, write_wav  # noqa: F401

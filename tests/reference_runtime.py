"""Import the live reference package (/root/reference) for parity tests.

The reference depends on numba only for @jit decoration of pure-python DP
kernels (``seq2seq_vc/modules/alignments.py``); the stub below turns @jit
into identity so those kernels run as plain Python under the installed
torch. No reference code is modified.
"""

from __future__ import annotations

import sys
import types

REFERENCE_ROOT = "/root/reference"


def _install_numba_stub():
    if "numba" in sys.modules:
        return
    numba = types.ModuleType("numba")

    def jit(*args, **kwargs):
        if len(args) == 1 and callable(args[0]) and not kwargs:
            return args[0]

        def deco(f):
            return f

        return deco

    class _DTypeStub:
        """Stands in for numba.float64 etc.; supports [:, :] slicing syntax."""

        def __getitem__(self, key):
            return self

        def __call__(self, *args, **kwargs):
            return self

    for name in ("float64", "float32", "int8", "int32", "int64", "boolean", "types"):
        setattr(numba, name, _DTypeStub())
    numba.jit = jit
    numba.njit = jit
    numba.prange = range
    sys.modules["numba"] = numba


def load_reference():
    """Make ``import seq2seq_vc`` resolve to the reference checkout."""
    _install_numba_stub()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    # the reference's losses/__init__.py imports a module missing from the
    # snapshot (losses/__init__.py:7, SURVEY.md "known reference bugs");
    # register an empty stand-in so `from .diffsinger_l2_loss import *` is a
    # no-op instead of an ImportError
    name = "seq2seq_vc.losses.diffsinger_l2_loss"
    if name not in sys.modules:
        stub = types.ModuleType(name)
        stub.__all__ = []
        sys.modules[name] = stub
    import seq2seq_vc  # noqa: F401

    return seq2seq_vc

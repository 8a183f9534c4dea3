"""Partitioner-safe 1-D convolution for composed tensor x sequence meshes.

Both XLA SPMD partitioners (GSPMD and Shardy — we reproduced the bug on
each) mis-transpose the *kernel gradient* of a spatial (k>1) convolution
when the activations are sharded along the spatial axis and the mesh also
carries another non-trivial axis that the conv does not use: the cotangent
is all-gathered across the idle axis without the matching division, so
every k>1 conv kernel grad comes back multiplied by the idle-axis size
(exactly 2.0 on a ``(data=2, model=2, seq=2)`` mesh). Dense contractions
(``dot_general``) are partitioned correctly in the same program, and k=1
convs lower to dots, so only true spatial convs are affected.
``scripts/repro_tp_sp.py`` is the minimized reproduction and the full-model
checker.

The workaround implemented here keeps the forward convolution bit-identical
(it still calls ``lax.conv_general_dilated``) but swaps the backward, via
``jax.custom_vjp``, to forms the partitioner handles correctly:

* ``dW`` is computed as ``k`` shifted dense contractions
  (``einsum('btgc,btgo->gco')`` over zero-shift-padded inputs) instead of
  XLA's conv-kernel-grad path;
* ``dx`` uses the standard transposed-conv form (input grads were never
  affected).

This path only activates inside a ``safe_conv_grads(True)`` scope — entered
by models when their ``sp_mesh`` composes a real tensor-parallel ``model``
axis with a ``seq`` axis (``mesh_needs_safe_convs``). Outside the scope the
modules below behave exactly like ``flax.linen.Conv`` (same parameters,
same names, same forward and backward), so single-axis runs keep XLA's
fused conv gradients.

Eligible convs: 1-D, stride 1, odd kernel, SAME padding, no dilation, any
``feature_group_count`` — which covers every k>1 conv on the AAS-VC /
FastSpeech-VC training paths (conformer depthwise + positionwise convs,
postnet, duration predictors incl. the stochastic flow's DDSConvs, and the
alignment module). Ineligible convs (the 2-D ``Conv2dSubsampling`` stacks)
fall back to the stock lowering; the full-model repro verifies their grads
are not affected.
"""

import contextlib
import contextvars
import functools
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

_SAFE_CONV_GRADS = contextvars.ContextVar("safe_conv_grads", default=False)

# lax.ConvDimensionNumbers for flax's channel-last 1-D layout.
_NHC_DIMNUMS = lax.conv_dimension_numbers((1, 1, 1), (1, 1, 1), ("NHC", "HIO", "NHC"))


@contextlib.contextmanager
def safe_conv_grads(enabled: bool = True):
    """Scope under which eligible ``Conv`` modules use the safe backward.

    Must be active while the forward computation is *traced* (enter it
    inside the jitted step / loss function, or around ``model.apply``).
    """
    token = _SAFE_CONV_GRADS.set(bool(enabled))
    try:
        yield
    finally:
        _SAFE_CONV_GRADS.reset(token)


def safe_conv_grads_enabled() -> bool:
    return _SAFE_CONV_GRADS.get()


def mesh_needs_safe_convs(mesh) -> bool:
    """True when ``mesh`` composes tensor parallelism with sequence
    parallelism — the layout that triggers the partitioner bug."""
    if mesh is None:
        return False
    shape = dict(mesh.shape)
    return shape.get("model", 1) > 1 and shape.get("seq", 1) > 1


def sp_safe_convs(call_fn):
    """Decorator for a model ``__call__`` holding an ``sp_mesh`` attribute:
    enters the safe-backward scope whenever the mesh composes TP x SP."""

    @functools.wraps(call_fn)
    def wrapped(self, *args, **kwargs):
        with safe_conv_grads(mesh_needs_safe_convs(self.sp_mesh)):
            return call_fn(self, *args, **kwargs)

    return wrapped


def _conv1d_fwd(x, w, groups, lo, precision):
    k = w.shape[0]
    return lax.conv_general_dilated(
        x,
        w,
        (1,),
        [(lo, k - 1 - lo)],
        dimension_numbers=_NHC_DIMNUMS,
        feature_group_count=groups,
        precision=precision,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _conv1d_safe(x, w, groups, lo, precision):
    return _conv1d_fwd(x, w, groups, lo, precision)


def _conv1d_safe_f(x, w, groups, lo, precision):
    return _conv1d_fwd(x, w, groups, lo, precision), (x, w)


def _conv1d_safe_b(groups, lo, precision, res, dy):
    x, w = res
    k, cin_g, o = w.shape
    g = groups
    og = o // g
    T = x.shape[1]
    hi = k - 1 - lo

    # dx: transposed conv of dy — per group swap I/O channels, flip taps.
    w_t = jnp.flip(
        w.reshape(k, cin_g, g, og).transpose(0, 3, 2, 1).reshape(k, og, g * cin_g), 0
    )
    dx = lax.conv_general_dilated(
        dy,
        w_t,
        (1,),
        [(hi, lo)],
        dimension_numbers=_NHC_DIMNUMS,
        feature_group_count=g,
        precision=precision,
    )

    # dW[j, c, g*og+o] = sum_{b,t} x[b, t+j-lo, g*cin_g+c] * dy[b, t, g*og+o]
    # as k shifted dense contractions (partitioner-safe, unlike the conv
    # kernel-grad lowering).
    def shifted(arr, off):
        if off == 0:
            return arr
        if off > 0:
            return jnp.pad(arr, ((0, 0), (0, off), (0, 0)))[:, off : off + T]
        return jnp.pad(arr, ((0, 0), (-off, 0), (0, 0)))[:, :T]

    B = x.shape[0]
    dyr = dy.reshape(B, T, g, og)
    dws = []
    for j in range(k):
        xr = shifted(x, j - lo).reshape(B, T, g, cin_g)
        dws.append(
            jnp.einsum("btgc,btgo->gco", xr, dyr).transpose(1, 0, 2).reshape(cin_g, o)
        )
    dw = jnp.stack(dws, 0).astype(w.dtype)
    return dx.astype(x.dtype), dw


_conv1d_safe.defvjp(_conv1d_safe_f, _conv1d_safe_b)


def _is_same_padding(padding, k):
    if isinstance(padding, str):
        return padding.upper() == "SAME"
    try:
        pairs = list(padding)
    except TypeError:
        return False
    if len(pairs) != 1:
        return False
    lo, hi = pairs[0]
    return lo == (k - 1) // 2 and hi == k // 2


class _SafeConvGeneralDilated:
    """Drop-in for ``lax.conv_general_dilated`` that routes eligible 1-D
    convs through the custom-VJP backward when the safe scope is active."""

    def __call__(
        self,
        lhs,
        rhs,
        window_strides=None,
        padding=None,
        lhs_dilation=None,
        rhs_dilation=None,
        dimension_numbers=None,
        feature_group_count=1,
        batch_group_count=1,
        precision=None,
        preferred_element_type=None,
    ):
        k = rhs.shape[0] if rhs.ndim == 3 else 0
        eligible = (
            safe_conv_grads_enabled()
            and lhs.ndim == 3
            and k > 1
            and k % 2 == 1
            and tuple(window_strides) == (1,)
            and lhs_dilation in (None, (1,))
            and rhs_dilation in (None, (1,))
            and dimension_numbers == _NHC_DIMNUMS
            and batch_group_count == 1
            and preferred_element_type is None
            and _is_same_padding(padding, k)
        )
        if not eligible:
            return lax.conv_general_dilated(
                lhs,
                rhs,
                window_strides,
                padding,
                lhs_dilation=lhs_dilation,
                rhs_dilation=rhs_dilation,
                dimension_numbers=dimension_numbers,
                feature_group_count=feature_group_count,
                batch_group_count=batch_group_count,
                precision=precision,
                preferred_element_type=preferred_element_type,
            )
        return _conv1d_safe(lhs, rhs, feature_group_count, (k - 1) // 2, precision)


class Conv(nn.Conv):
    """``flax.linen.Conv`` with a partitioner-safe backward under
    ``safe_conv_grads`` scopes. Identical parameters, names (auto-naming
    still yields ``Conv_<i>``), forward math, and — outside the scope —
    backward lowering."""

    conv_general_dilated_cls: Any = _SafeConvGeneralDilated

"""VITS normalizing flows + stochastic duration predictor (flax.linen).

Functional match with reference ``modules/vits/flow.py``, ``vits/transform.py``
and ``modules/duration_predictor.py:131-304``. Layout is channel-last
(B, T, C) throughout (TPU-friendly); the piecewise rational-quadratic spline
is fully vectorized with ``jnp.where`` selects instead of boolean indexing,
so both flow directions are jittable (SURVEY.md §7 hard-part 4).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn

from .conv import Conv
import jax
import jax.numpy as jnp

DEFAULT_MIN_BIN_WIDTH = 1e-3
DEFAULT_MIN_BIN_HEIGHT = 1e-3
DEFAULT_MIN_DERIVATIVE = 1e-3


def _searchsorted(bin_locations, inputs, eps: float = 1e-6):
    bin_locations = bin_locations.at[..., -1].add(eps)
    return jnp.sum(inputs[..., None] >= bin_locations, axis=-1) - 1


def rational_quadratic_spline(
    inputs,
    unnormalized_widths,
    unnormalized_heights,
    unnormalized_derivatives,
    inverse: bool = False,
    left: float = 0.0,
    right: float = 1.0,
    bottom: float = 0.0,
    top: float = 1.0,
    min_bin_width: float = DEFAULT_MIN_BIN_WIDTH,
    min_bin_height: float = DEFAULT_MIN_BIN_HEIGHT,
    min_derivative: float = DEFAULT_MIN_DERIVATIVE,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Monotonic rational-quadratic spline (nflows formulation), vectorized."""
    num_bins = unnormalized_widths.shape[-1]

    widths = jax.nn.softmax(unnormalized_widths, axis=-1)
    widths = min_bin_width + (1 - min_bin_width * num_bins) * widths
    cumwidths = jnp.cumsum(widths, axis=-1)
    cumwidths = jnp.pad(cumwidths, [(0, 0)] * (cumwidths.ndim - 1) + [(1, 0)])
    cumwidths = (right - left) * cumwidths + left
    cumwidths = cumwidths.at[..., 0].set(left).at[..., -1].set(right)
    widths = cumwidths[..., 1:] - cumwidths[..., :-1]

    derivatives = min_derivative + jax.nn.softplus(unnormalized_derivatives)

    heights = jax.nn.softmax(unnormalized_heights, axis=-1)
    heights = min_bin_height + (1 - min_bin_height * num_bins) * heights
    cumheights = jnp.cumsum(heights, axis=-1)
    cumheights = jnp.pad(cumheights, [(0, 0)] * (cumheights.ndim - 1) + [(1, 0)])
    cumheights = (top - bottom) * cumheights + bottom
    cumheights = cumheights.at[..., 0].set(bottom).at[..., -1].set(top)
    heights = cumheights[..., 1:] - cumheights[..., :-1]

    bins = cumheights if inverse else cumwidths
    bin_idx = jnp.clip(_searchsorted(bins, inputs), 0, num_bins - 1)[..., None]

    def take(x):
        return jnp.take_along_axis(x, bin_idx, axis=-1)[..., 0]

    input_cumwidths = take(cumwidths[..., :-1])
    input_bin_widths = take(widths)
    input_cumheights = take(cumheights[..., :-1])
    delta = heights / widths
    input_delta = take(delta)
    input_derivatives = take(derivatives[..., :-1])
    input_derivatives_plus_one = take(derivatives[..., 1:])
    input_heights = take(heights)

    if inverse:
        a = (inputs - input_cumheights) * (
            input_derivatives + input_derivatives_plus_one - 2 * input_delta
        ) + input_heights * (input_delta - input_derivatives)
        b = input_heights * input_derivatives - (inputs - input_cumheights) * (
            input_derivatives + input_derivatives_plus_one - 2 * input_delta
        )
        c = -input_delta * (inputs - input_cumheights)
        discriminant = jnp.maximum(b ** 2 - 4 * a * c, 0.0)
        root = (2 * c) / (-b - jnp.sqrt(discriminant))
        outputs = root * input_bin_widths + input_cumwidths
        theta_one_minus_theta = root * (1 - root)
        denominator = input_delta + (
            (input_derivatives + input_derivatives_plus_one - 2 * input_delta)
            * theta_one_minus_theta
        )
        derivative_numerator = input_delta ** 2 * (
            input_derivatives_plus_one * root ** 2
            + 2 * input_delta * theta_one_minus_theta
            + input_derivatives * (1 - root) ** 2
        )
        logabsdet = jnp.log(derivative_numerator) - 2 * jnp.log(denominator)
        return outputs, -logabsdet
    else:
        theta = (inputs - input_cumwidths) / input_bin_widths
        theta_one_minus_theta = theta * (1 - theta)
        numerator = input_heights * (
            input_delta * theta ** 2 + input_derivatives * theta_one_minus_theta
        )
        denominator = input_delta + (
            (input_derivatives + input_derivatives_plus_one - 2 * input_delta)
            * theta_one_minus_theta
        )
        outputs = input_cumheights + numerator / denominator
        derivative_numerator = input_delta ** 2 * (
            input_derivatives_plus_one * theta ** 2
            + 2 * input_delta * theta_one_minus_theta
            + input_derivatives * (1 - theta) ** 2
        )
        logabsdet = jnp.log(derivative_numerator) - 2 * jnp.log(denominator)
        return outputs, logabsdet


def piecewise_rational_quadratic_transform(
    inputs,
    unnormalized_widths,
    unnormalized_heights,
    unnormalized_derivatives,
    inverse: bool = False,
    tails: Optional[str] = "linear",
    tail_bound: float = 5.0,
):
    """Spline inside [-tail_bound, tail_bound], identity linear tails outside."""
    if tails is None:
        return rational_quadratic_spline(
            inputs, unnormalized_widths, unnormalized_heights,
            unnormalized_derivatives, inverse,
        )
    if tails != "linear":
        raise ValueError(f"{tails} tails are not implemented")

    inside = (inputs >= -tail_bound) & (inputs <= tail_bound)
    constant = math.log(math.exp(1 - DEFAULT_MIN_DERIVATIVE) - 1)
    pad = [(0, 0)] * (unnormalized_derivatives.ndim - 1) + [(1, 1)]
    ud = jnp.pad(unnormalized_derivatives, pad)
    ud = ud.at[..., 0].set(constant).at[..., -1].set(constant)

    safe_inputs = jnp.clip(inputs, -tail_bound, tail_bound)
    out_in, ld_in = rational_quadratic_spline(
        safe_inputs,
        unnormalized_widths,
        unnormalized_heights,
        ud,
        inverse=inverse,
        left=-tail_bound,
        right=tail_bound,
        bottom=-tail_bound,
        top=tail_bound,
    )
    outputs = jnp.where(inside, out_in, inputs)
    logabsdet = jnp.where(inside, ld_in, 0.0)
    return outputs, logabsdet


def flip_flow(x, inverse: bool = False):
    """Flip along the channel axis. x: (B, T, C)."""
    y = jnp.flip(x, axis=-1)
    if not inverse:
        return y, jnp.zeros(x.shape[0], x.dtype)
    return y


def log_flow(x, x_mask, inverse: bool = False, eps: float = 1e-5):
    """x: (B, T, C); x_mask: (B, T, 1)."""
    if not inverse:
        y = jnp.log(jnp.maximum(x, eps)) * x_mask
        logdet = jnp.sum(-y, axis=(1, 2))
        return y, logdet
    return jnp.exp(x) * x_mask


class ElementwiseAffineFlow(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x, x_mask, inverse: bool = False, **kwargs):
        m = self.param("m", nn.initializers.zeros, (self.channels,))
        logs = self.param("logs", nn.initializers.zeros, (self.channels,))
        if not inverse:
            y = (m + jnp.exp(logs) * x) * x_mask
            logdet = jnp.sum(logs[None, None, :] * x_mask, axis=(1, 2))
            return y, logdet
        return (x - m) * jnp.exp(-logs) * x_mask


class DilatedDepthSeparableConv(nn.Module):
    """Residual stack of (depthwise dilated conv, LN, GELU, 1x1, LN, GELU)."""

    channels: int
    kernel_size: int
    layers: int
    dropout_rate: float = 0.0
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, x_mask, g=None, deterministic: bool = True):
        """x: (B, T, C); x_mask: (B, T, 1)."""
        if g is not None:
            x = x + g
        for i in range(self.layers):
            dilation = self.kernel_size ** i
            y = Conv(
                self.channels,
                (self.kernel_size,),
                kernel_dilation=dilation,
                padding="SAME",
                feature_group_count=self.channels,
            )(x * x_mask)
            y = nn.LayerNorm(epsilon=self.eps)(y)
            y = nn.gelu(y)
            y = Conv(self.channels, (1,))(y)
            y = nn.LayerNorm(epsilon=self.eps)(y)
            y = nn.gelu(y)
            y = nn.Dropout(self.dropout_rate)(y, deterministic=deterministic)
            x = x + y
        return x * x_mask


class ConvFlow(nn.Module):
    """Coupling flow with rational-quadratic spline conditioner."""

    in_channels: int
    hidden_channels: int
    kernel_size: int
    layers: int
    bins: int = 10
    tail_bound: float = 5.0

    @nn.compact
    def __call__(self, x, x_mask, g=None, inverse: bool = False):
        """x: (B, T, in_channels); x_mask: (B, T, 1)."""
        half = self.in_channels // 2
        xa, xb = x[..., :half], x[..., half:]
        h = Conv(self.hidden_channels, (1,), name="input_conv")(xa)
        h = DilatedDepthSeparableConv(
            self.hidden_channels, self.kernel_size, self.layers, name="dds_conv"
        )(h, x_mask, g=g)
        h = Conv(
            half * (self.bins * 3 - 1),
            (1,),
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="proj",
        )(h) * x_mask  # (B, T, half*(3*bins-1))

        b, t, _ = xa.shape
        h = h.reshape(b, t, half, self.bins * 3 - 1)
        h = h.transpose(0, 2, 1, 3)  # (B, half, T, 3*bins-1)
        xb_t = xb.transpose(0, 2, 1)  # (B, half, T)

        denom = math.sqrt(self.hidden_channels)
        uw = h[..., : self.bins] / denom
        uh = h[..., self.bins : 2 * self.bins] / denom
        ud = h[..., 2 * self.bins :]
        xb_t, logdet_abs = piecewise_rational_quadratic_transform(
            xb_t, uw, uh, ud, inverse=inverse, tails="linear", tail_bound=self.tail_bound
        )
        xb = xb_t.transpose(0, 2, 1)
        y = jnp.concatenate([xa, xb], axis=-1) * x_mask
        if not inverse:
            logdet = jnp.sum(
                logdet_abs.transpose(0, 2, 1) * x_mask, axis=(1, 2)
            )
            return y, logdet
        return y


class StochasticDurationPredictor(nn.Module):
    """VITS stochastic duration predictor.

    Training: ``__call__(x, x_mask, w=durations)`` -> per-item NLL (B,).
    Inference: ``__call__(x, x_mask, inverse=True, noise_scale=s)`` ->
    durations (B, T) via ``ceil(exp(logw))``.

    x: (B, T, C) conditioner (gradient is stopped, as in the reference);
    x_mask: (B, T) True at valid tokens. Needs the 'noise' RNG collection.
    """

    channels: int = 192
    kernel_size: int = 3
    dropout_rate: float = 0.5
    flows: int = 4
    dds_conv_layers: int = 3
    global_channels: int = -1

    def setup(self):
        self.pre = nn.Dense(self.channels)
        self.dds = DilatedDepthSeparableConv(
            self.channels, self.kernel_size, self.dds_conv_layers, self.dropout_rate
        )
        self.proj = nn.Dense(self.channels)
        self.main_flows = [ElementwiseAffineFlow(2)] + [
            ConvFlow(2, self.channels, self.kernel_size, self.dds_conv_layers)
            for _ in range(self.flows)
        ]
        self.post_pre = nn.Dense(self.channels)
        self.post_dds = DilatedDepthSeparableConv(
            self.channels, self.kernel_size, self.dds_conv_layers, self.dropout_rate
        )
        self.post_proj = nn.Dense(self.channels)
        self.post_flows = [ElementwiseAffineFlow(2)] + [
            ConvFlow(2, self.channels, self.kernel_size, self.dds_conv_layers)
            for _ in range(self.flows)
        ]
        if self.global_channels > 0:
            self.global_proj = nn.Dense(self.channels)

    def _run_flow_seq(self, flow_list, z, mask, g, inverse, skip_last_conv=False):
        """Apply [affine, (conv, flip) x flows]; inverse runs the reverse
        order, dropping the conv flow adjacent to the affine (the reference's
        'useless vflow' removal)."""
        if not inverse:
            logdet_tot = jnp.zeros(z.shape[0], z.dtype)
            z, ld = flow_list[0](z, mask, inverse=False)
            logdet_tot += ld
            for f in flow_list[1:]:
                z, ld = f(z, mask, g=g, inverse=False)
                logdet_tot += ld
                z, ld = flip_flow(z, inverse=False)
                logdet_tot += ld
            return z, logdet_tot
        else:
            convs = flow_list[1:]
            start = 1 if skip_last_conv else 0
            for f in reversed(convs[start:] if skip_last_conv else convs):
                z = flip_flow(z, inverse=True)
                z = f(z, mask, g=g, inverse=True)
            if skip_last_conv:
                z = flip_flow(z, inverse=True)
            z = flow_list[0](z, mask, inverse=True)
            return z

    def __call__(
        self,
        x: jnp.ndarray,
        x_mask: jnp.ndarray,
        w: Optional[jnp.ndarray] = None,
        g: Optional[jnp.ndarray] = None,
        inverse: bool = False,
        noise_scale: float = 1.0,
        deterministic: bool = True,
        noise: Optional[jnp.ndarray] = None,
    ):
        """``noise`` (B, T, 2) overrides the internal gaussian draw (e_q in
        training, z in inference) — used by cross-framework parity tests to
        pin both implementations to identical randomness."""
        mask = x_mask[..., None].astype(x.dtype)  # (B, T, 1)
        x = jax.lax.stop_gradient(x)
        x = self.pre(x)
        if g is not None:
            x = x + self.global_proj(jax.lax.stop_gradient(g))
        x = self.dds(x, mask, deterministic=deterministic)
        x = self.proj(x) * mask

        if not inverse:
            assert w is not None, "w must be provided"
            w = w[..., None].astype(x.dtype)  # (B, T, 1)
            h_w = self.post_pre(w)
            h_w = self.post_dds(h_w, mask, deterministic=deterministic)
            h_w = self.post_proj(h_w) * mask

            e_q = (
                noise
                if noise is not None
                else jax.random.normal(
                    self.make_rng("noise"), (x.shape[0], x.shape[1], 2)
                )
            ) * mask
            z_q, logdet_tot_q = self._run_flow_seq(
                self.post_flows, e_q, mask, g=x + h_w, inverse=False
            )
            z_u, z1 = z_q[..., :1], z_q[..., 1:]
            u = jax.nn.sigmoid(z_u) * mask
            z0 = (w - u) * mask
            logdet_tot_q += jnp.sum(
                (jax.nn.log_sigmoid(z_u) + jax.nn.log_sigmoid(-z_u)) * mask,
                axis=(1, 2),
            )
            logq = (
                jnp.sum(-0.5 * (math.log(2 * math.pi) + e_q ** 2) * mask, axis=(1, 2))
                - logdet_tot_q
            )

            z0, logdet_tot = log_flow(z0, mask, inverse=False)
            z = jnp.concatenate([z0, z1], axis=-1)
            z, ld = self._run_flow_seq(self.main_flows, z, mask, g=x, inverse=False)
            logdet_tot += ld
            nll = (
                jnp.sum(0.5 * (math.log(2 * math.pi) + z ** 2) * mask, axis=(1, 2))
                - logdet_tot
            )
            return nll + logq  # (B,)
        else:
            z = (
                noise
                if noise is not None
                else jax.random.normal(
                    self.make_rng("noise"), (x.shape[0], x.shape[1], 2)
                )
            ) * noise_scale
            z = self._run_flow_seq(
                self.main_flows, z, mask, g=x, inverse=True, skip_last_conv=True
            )
            logw = z[..., 0]
            w = jnp.exp(logw) * x_mask
            return jnp.ceil(w)

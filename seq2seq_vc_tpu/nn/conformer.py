"""Conformer encoder (flax.linen) — the AAS-VC workhorse.

Mirrors reference ``modules/conformer/{encoder,encoder_layer,convolution}.py``
(macaron FFN x0.5, rel-pos self-attention, GLU conv module, final LN).

Deviation (documented, SURVEY.md §7 hard-part 7): the conv module's
BatchNorm is replaced by GroupNorm(1) by default — batch statistics are a
poor fit for pjit data parallelism (they would need cross-device sync every
step); group norm is per-sample, mask-safe, and jit-pure. Set
``conv_norm_type='batch_norm'`` for a torch-parity experiment (uses flax
BatchNorm with mutable ``batch_stats``).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn

from .conv import Conv
import jax
import jax.numpy as jnp

from .attention import (
    LegacyRelPositionMultiHeadedAttention,
    MultiHeadedAttention,
    RelPositionMultiHeadedAttention,
)
from .transformer import LN_EPS, _make_pos_enc, _positionwise, Conv2dSubsampling


class MaskedGroupNorm(nn.Module):
    """Single-group norm whose statistics ignore padded positions.

    Normalizes each sample over (time, channels) using only valid frames, so
    outputs are invariant to pad length (unlike BatchNorm/GroupNorm over
    padded buffers). Per-channel scale/bias like GroupNorm.
    """

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, mask=None):
        # x: (B, T, C); mask: (B, T) True at valid frames or None.
        # Statistics accumulate in fp32 even under bf16 compute; the output
        # is returned in the input dtype.
        c = x.shape[-1]
        in_dtype = x.dtype
        xf = x.astype(jnp.float32)
        if mask is None:
            mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
            var = jnp.mean((xf - mean) ** 2, axis=(1, 2), keepdims=True)
        else:
            m = mask[..., None].astype(jnp.float32)
            denom = jnp.maximum(m.sum(axis=(1, 2), keepdims=True) * c, 1.0)
            mean = jnp.sum(xf * m, axis=(1, 2), keepdims=True) / denom
            var = jnp.sum(((xf - mean) * m) ** 2, axis=(1, 2), keepdims=True) / denom
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(in_dtype)


class ConvolutionModule(nn.Module):
    """Pointwise(2C) -> GLU -> depthwise -> norm -> swish -> pointwise.

    Padded frames are zeroed before the depthwise conv and excluded from the
    norm statistics, so the module is pad-length invariant.
    """

    channels: int
    kernel_size: int
    conv_norm_type: str = "group_norm"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        assert (self.kernel_size - 1) % 2 == 0
        if mask is not None:
            x = x * mask[..., None].astype(x.dtype)
        h = Conv(2 * self.channels, (1,), dtype=self.dtype)(x)
        h = nn.glu(h, axis=-1)
        if mask is not None:
            h = h * mask[..., None].astype(h.dtype)
        h = Conv(
            self.channels,
            (self.kernel_size,),
            padding="SAME",
            feature_group_count=self.channels,
            dtype=self.dtype,
        )(h)
        if self.conv_norm_type == "group_norm":
            h = MaskedGroupNorm()(h, mask)
        elif self.conv_norm_type == "batch_norm":
            h = nn.BatchNorm(use_running_average=deterministic)(h)
        else:
            raise ValueError(self.conv_norm_type)
        h = nn.swish(h)
        return Conv(self.channels, (1,), dtype=self.dtype)(h)


class ConformerEncoderLayer(nn.Module):
    """Macaron-FFN + rel-pos MHA + conv module + FFN + final LN."""

    size: int
    n_head: int
    linear_units: int
    dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    normalize_before: bool = True
    concat_after: bool = False
    positionwise_layer_type: str = "linear"
    positionwise_conv_kernel_size: int = 1
    selfattention_layer_type: str = "rel_selfattn"
    macaron_style: bool = True
    use_cnn_module: bool = True
    cnn_module_kernel: int = 31
    conv_norm_type: str = "group_norm"
    zero_triu: bool = False
    attention_backend: str = "xla"
    dtype: Any = None  # computation dtype (LN statistics stay fp32)
    # sequence parallelism (ring attention over the mesh 'seq' axis)
    sp_mesh: Any = None
    sp_axis: str = "seq"

    def setup(self):
        if self.selfattention_layer_type == "selfattn":
            self.self_attn = MultiHeadedAttention(
                self.n_head, self.size, self.attention_dropout_rate,
                backend=self.attention_backend, dtype=self.dtype,
            )
        elif self.selfattention_layer_type == "rel_selfattn":
            self.self_attn = RelPositionMultiHeadedAttention(
                self.n_head, self.size, self.attention_dropout_rate,
                zero_triu=self.zero_triu, backend=self.attention_backend,
                dtype=self.dtype, sp_mesh=self.sp_mesh, sp_axis=self.sp_axis,
            )
        elif self.selfattention_layer_type == "legacy_rel_selfattn":
            # sp fields forwarded so a sequence_parallel request on the
            # legacy style fails loudly instead of silently running dense
            self.self_attn = LegacyRelPositionMultiHeadedAttention(
                self.n_head, self.size, self.attention_dropout_rate,
                zero_triu=self.zero_triu, backend=self.attention_backend,
                dtype=self.dtype, sp_mesh=self.sp_mesh, sp_axis=self.sp_axis,
            )
        else:
            raise ValueError(self.selfattention_layer_type)
        # conformer passes Swish into the linear-flavor FFN (reference
        # conformer/encoder.py:102,181-188); conv flavors keep internal ReLU
        self.feed_forward = _positionwise(
            self.positionwise_layer_type, self.linear_units,
            self.dropout_rate, self.positionwise_conv_kernel_size, self.dtype,
            activation="swish",
        )
        if self.macaron_style:
            self.feed_forward_macaron = _positionwise(
                self.positionwise_layer_type, self.linear_units,
                self.dropout_rate, self.positionwise_conv_kernel_size, self.dtype,
                activation="swish",
            )
            self.norm_ff_macaron = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype)
        if self.use_cnn_module:
            self.conv_module = ConvolutionModule(
                self.size, self.cnn_module_kernel, self.conv_norm_type,
                dtype=self.dtype,
            )
            self.norm_conv = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype)
            self.norm_final = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype)
        self.norm_ff = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype)
        self.norm_mha = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype)
        self.dropout = nn.Dropout(self.dropout_rate)
        if self.concat_after:
            self.concat_linear = nn.Dense(self.size, dtype=self.dtype)

    def __call__(self, x, mask, pos_emb=None, deterministic: bool = True):
        ff_scale = 0.5 if self.macaron_style else 1.0

        if self.macaron_style:
            residual = x
            h = self.norm_ff_macaron(x) if self.normalize_before else x
            x = residual + ff_scale * self.dropout(
                self.feed_forward_macaron(h, deterministic=deterministic),
                deterministic=deterministic,
            )
            if not self.normalize_before:
                x = self.norm_ff_macaron(x)

        residual = x
        h = self.norm_mha(x) if self.normalize_before else x
        if pos_emb is not None:
            att = self.self_attn(h, h, h, pos_emb, mask, deterministic=deterministic)
        else:
            att = self.self_attn(h, h, h, mask, deterministic=deterministic)
        if self.concat_after:
            x = residual + self.concat_linear(jnp.concatenate([h, att], axis=-1))
        else:
            x = residual + self.dropout(att, deterministic=deterministic)
        if not self.normalize_before:
            x = self.norm_mha(x)

        if self.use_cnn_module:
            residual = x
            h = self.norm_conv(x) if self.normalize_before else x
            frame_mask = None if mask is None else mask[:, 0, :]
            x = residual + self.dropout(
                self.conv_module(h, frame_mask, deterministic=deterministic),
                deterministic=deterministic,
            )
            if not self.normalize_before:
                x = self.norm_conv(x)

        residual = x
        h = self.norm_ff(x) if self.normalize_before else x
        x = residual + ff_scale * self.dropout(
            self.feed_forward(h, deterministic=deterministic),
            deterministic=deterministic,
        )
        if not self.normalize_before:
            x = self.norm_ff(x)

        if self.use_cnn_module:
            x = self.norm_final(x)
        return x


class ConformerEncoder(nn.Module):
    """Conformer encoder (reference ``conformer/encoder.py:37``)."""

    idim: int
    attention_dim: int = 256
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 6
    dropout_rate: float = 0.1
    positional_dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    input_layer: Optional[str] = "conv2d"
    normalize_before: bool = True
    concat_after: bool = False
    positionwise_layer_type: str = "linear"
    positionwise_conv_kernel_size: int = 1
    macaron_style: bool = True
    pos_enc_layer_type: str = "rel_pos"  # abs_pos | scaled_abs_pos | rel_pos | legacy_rel_pos
    selfattention_layer_type: str = "rel_selfattn"
    use_cnn_module: bool = True
    cnn_module_kernel: int = 31
    conv_norm_type: str = "group_norm"
    zero_triu: bool = False
    padding_idx: int = 0
    attention_backend: str = "xla"
    # computation dtype for the layer stack (e.g. jnp.bfloat16): the
    # residual stream runs in this dtype, LN/softmax statistics stay fp32,
    # params stay fp32, and the final output is cast back to fp32.
    dtype: Any = None
    # rematerialize each layer in the backward pass (jax.checkpoint): trades
    # recompute FLOPs for HBM traffic — a win when the step is
    # bandwidth-bound (see scripts/profile_train.py)
    remat: bool = False
    # sequence parallelism: shard_map ring attention over this mesh's
    # sp_axis; activations are sharding-constrained to (data, seq) between
    # layers so the whole stack partitions over time
    sp_mesh: Any = None
    sp_axis: str = "seq"
    # pipeline parallelism: GPipe the layer stack over this mesh's
    # pipe_axis (parallel/pp.pipeline_module_stack), composed with data
    # parallelism over its data axis. num_blocks must divide by the pipe
    # size and the batch by pipe_microbatches. Mutually exclusive with
    # sp_mesh/remat (enforced below); init always runs the serial stack.
    pipe_mesh: Any = None
    pipe_axis: str = "pipe"
    pipe_microbatches: int = 0  # 0 -> the pipe-axis size

    @property
    def conv_subsampling_factor(self) -> int:
        return 4 if self.input_layer == "conv2d" else 1

    def setup(self):
        if self.input_layer == "linear":
            self.pre = nn.Dense(self.attention_dim)
            # plain torch.nn.LayerNorm (eps 1e-5), not the espnet 1e-12 one
            # (reference conformer/encoder.py:117-122)
            self.pre_norm = nn.LayerNorm(epsilon=1e-5)
        elif self.input_layer == "conv2d":
            self.subsample = Conv2dSubsampling(self.attention_dim)
        elif self.input_layer == "embed":
            self.embed_tokens = nn.Embed(self.idim, self.attention_dim)
        elif self.input_layer is not None:
            raise ValueError(f"unknown input_layer: {self.input_layer}")

        kind = {
            "abs_pos": "abs",
            "scaled_abs_pos": "scaled",
            "rel_pos": "rel_pos",
            "legacy_rel_pos": "legacy_rel_pos",
        }[self.pos_enc_layer_type]
        self.pos_enc = _make_pos_enc(
            kind, self.attention_dim, self.positional_dropout_rate
        )
        layer_cls = (
            nn.remat(ConformerEncoderLayer, static_argnums=(4,))
            if self.remat
            else ConformerEncoderLayer
        )
        self.layers = [
            layer_cls(
                self.attention_dim,
                self.attention_heads,
                self.linear_units,
                self.dropout_rate,
                self.attention_dropout_rate,
                self.normalize_before,
                self.concat_after,
                self.positionwise_layer_type,
                self.positionwise_conv_kernel_size,
                self.selfattention_layer_type,
                self.macaron_style,
                self.use_cnn_module,
                self.cnn_module_kernel,
                self.conv_norm_type,
                self.zero_triu,
                self.attention_backend,
                dtype=self.dtype,
                sp_mesh=self.sp_mesh,
                sp_axis=self.sp_axis,
            )
            for _ in range(self.num_blocks)
        ]
        if self.normalize_before:
            self.after_norm = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype)
        self.input_dropout = nn.Dropout(self.dropout_rate)

    def __call__(self, xs, masks: Optional[jnp.ndarray], deterministic: bool = True):
        """Encode. xs: (B, T, idim) or (B, T) ints; masks: (B, T) non-pad."""
        if self.input_layer == "linear":
            # Linear -> LN -> Dropout, NO ReLU (the conformer embed differs
            # from the transformer encoder's here — conformer/encoder.py:117,
            # transformer/encoder.py:99-105 has the extra ReLU)
            xs = self.input_dropout(
                self.pre_norm(self.pre(xs)), deterministic=deterministic
            )
        elif self.input_layer == "conv2d":
            xs, masks = self.subsample(xs, masks)
        elif self.input_layer == "embed":
            xs = self.embed_tokens(xs)

        pos_emb = None
        out = self.pos_enc(xs, deterministic=deterministic)
        if isinstance(out, tuple):
            xs, pos_emb = out
        else:
            xs = out

        if self.dtype is not None:
            xs = xs.astype(self.dtype)
        attn_mask = None if masks is None else masks[:, None, :]
        sp_constraint = None
        if self.sp_mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            sp_constraint = NamedSharding(
                self.sp_mesh, P("data", self.sp_axis, None)
            )
            xs = jax.lax.with_sharding_constraint(xs, sp_constraint)
        pipe_n = (
            dict(self.pipe_mesh.shape).get(self.pipe_axis, 1)
            if self.pipe_mesh is not None
            else 1
        )
        if pipe_n > 1 and not self.is_initializing():
            if self.sp_mesh is not None or self.remat:
                raise ValueError(
                    "pipe_mesh is mutually exclusive with sp_mesh/remat"
                )
            xs = self._pipelined_stack(
                xs, masks, pos_emb, deterministic, pipe_n
            )
        else:
            for layer in self.layers:
                # positional args: under remat, `deterministic` (argnum 4)
                # is a static argument of the checkpointed call
                xs = layer(xs, attn_mask, pos_emb, deterministic)
                if sp_constraint is not None:
                    xs = jax.lax.with_sharding_constraint(xs, sp_constraint)
        if self.normalize_before:
            xs = self.after_norm(xs)
        return xs.astype(jnp.float32), masks

    def _pipelined_stack(self, xs, masks, pos_emb, deterministic, pipe_n):
        """Run the layer stack GPipe-pipelined over ``pipe_mesh``.

        The per-layer params already exist under this module (the serial
        branch creates them at init), so they are collected from the bound
        children, stacked, and stage-sharded by
        ``parallel/pp.pipeline_module_stack``; one unbound layer clone
        replays them. Dropout keys are folded from (layer_idx, microbatch)
        so every layer x microbatch draw is independent.
        """
        from ..parallel.pp import pipeline_module_stack

        n_micro = self.pipe_microbatches or pipe_n
        tmpl = self.layers[0].clone(parent=None)
        layer_params = [lyr.variables["params"] for lyr in self.layers]
        bc = {"pos_emb": () if pos_emb is None else pos_emb}
        if not deterministic:
            bc["seed"] = jax.random.randint(
                self.make_rng("dropout"), (1,), 0, 2**31 - 1, dtype=jnp.int32
            )

        def apply_fn(p, x, mask_mb, bc_in, mb_idx, layer_idx):
            attn = None if isinstance(mask_mb, tuple) else mask_mb[:, None, :]
            pe = None if isinstance(bc_in["pos_emb"], tuple) else bc_in["pos_emb"]
            rngs = None
            if "seed" in bc_in:
                key = jax.random.fold_in(
                    jax.random.fold_in(
                        jax.random.PRNGKey(bc_in["seed"][0]), layer_idx
                    ),
                    mb_idx,
                )
                rngs = {"dropout": key}
            return tmpl.apply({"params": p}, x, attn, pe, deterministic, rngs=rngs)

        return pipeline_module_stack(
            apply_fn,
            layer_params,
            xs,
            extras=masks,
            bcast=bc,
            mesh=self.pipe_mesh,
            n_micro=n_micro,
            axis_name=self.pipe_axis,
        )

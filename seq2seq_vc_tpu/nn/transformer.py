"""Transformer encoder/decoder stack (flax.linen).

Structure mirrors reference ``modules/transformer/{encoder,decoder,
encoder_layer,decoder_layer,subsampling}.py`` (pre/post-LN residual blocks,
concat_after option, conv2d time subsampling, LayerNorm eps 1e-12) with one
deliberate redesign: autoregressive decoding uses a fixed-size per-layer KV
cache written via ``lax.dynamic_update_slice`` and masked attention over the
full buffer (static shapes for jit), instead of the reference's
recompute-the-prefix cache (``decoder_layer.py:204-218``). Cross-attention
K/V are projected once per utterance (``precompute_memory``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn

from .conv import Conv
import jax
import jax.numpy as jnp

from .attention import (
    LegacyRelPositionMultiHeadedAttention,
    MultiHeadedAttention,
    RelPositionMultiHeadedAttention,
)
from .positional_encoding import (
    LegacyRelPositionalEncoding,
    PositionalEncoding,
    RelPositionalEncoding,
    ScaledPositionalEncoding,
    sinusoidal_pe,
)

LN_EPS = 1e-12  # reference layer_norm.py uses eps=1e-12


class PositionwiseFeedForward(nn.Module):
    hidden_units: int
    dropout_rate: float = 0.1
    dtype: Any = None  # computation dtype (params stay fp32)
    # 'relu' (transformer default) or 'swish' (the conformer passes Swish
    # into this layer — reference conformer/encoder.py:102,181-188)
    activation: str = "relu"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        d = x.shape[-1]
        act = nn.swish if self.activation == "swish" else nn.relu
        h = act(nn.Dense(self.hidden_units, dtype=self.dtype)(x))
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return nn.Dense(d, dtype=self.dtype)(h)


class MultiLayeredConv1d(nn.Module):
    """FastSpeech-style two-conv positionwise layer (conv -> relu -> conv)."""

    hidden_chans: int
    kernel_size: int
    dropout_rate: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        d = x.shape[-1]
        h = Conv(
            self.hidden_chans, (self.kernel_size,), padding="SAME", dtype=self.dtype
        )(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return Conv(d, (self.kernel_size,), padding="SAME", dtype=self.dtype)(h)


class Conv1dLinear(nn.Module):
    """Conv -> relu -> linear positionwise layer."""

    hidden_chans: int
    kernel_size: int
    dropout_rate: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        d = x.shape[-1]
        h = Conv(
            self.hidden_chans, (self.kernel_size,), padding="SAME", dtype=self.dtype
        )(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return nn.Dense(d, dtype=self.dtype)(h)


def _positionwise(
    kind: str, linear_units: int, dropout_rate: float, kernel: int, dtype: Any = None,
    activation: str = "relu",
):
    # `activation` only affects the 'linear' flavor: the conv flavors have
    # hard-coded internal ReLUs in the reference regardless of caller
    if kind == "linear":
        return PositionwiseFeedForward(
            linear_units, dropout_rate, dtype=dtype, activation=activation
        )
    if kind == "conv1d":
        return MultiLayeredConv1d(linear_units, kernel, dropout_rate, dtype=dtype)
    if kind == "conv1d-linear":
        return Conv1dLinear(linear_units, kernel, dropout_rate, dtype=dtype)
    raise ValueError(f"unknown positionwise_layer_type: {kind}")


class Conv2dSubsampling(nn.Module):
    """Two stride-2 3x3 convs over (time, freq): 1/4 time reduction.

    Mirrors reference ``subsampling.py:44-104`` including the mask slicing
    ``mask[:, :-2:2][:, :-2:2]``.
    """

    odim: int

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray]):
        # x: (B, T, idim) -> (B, T, idim, 1) channel-last 2D conv
        h = x[..., None]
        h = nn.relu(Conv(self.odim, (3, 3), strides=(2, 2), padding="VALID")(h))
        h = nn.relu(Conv(self.odim, (3, 3), strides=(2, 2), padding="VALID")(h))
        b, t, f, c = h.shape
        h = nn.Dense(self.odim)(h.reshape(b, t, f * c))
        if mask is not None:
            mask = mask[:, :-2:2][:, :-2:2]
        return h, mask


class Conv2dSubsampling2(nn.Module):
    """1/2 time reduction (reference ``subsampling.py`` x2 variant)."""

    odim: int

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray]):
        h = x[..., None]
        h = nn.relu(Conv(self.odim, (3, 3), strides=(2, 2), padding="VALID")(h))
        h = nn.relu(Conv(self.odim, (3, 3), strides=(1, 1), padding="VALID")(h))
        b, t, f, c = h.shape
        h = nn.Dense(self.odim)(h.reshape(b, t, f * c))
        if mask is not None:
            mask = mask[:, :-2:2][:, :-2:1]
        return h, mask


class Conv2dSubsampling6(nn.Module):
    """1/6 time reduction (stride 2 then 3)."""

    odim: int

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray]):
        h = x[..., None]
        h = nn.relu(Conv(self.odim, (3, 3), strides=(2, 2), padding="VALID")(h))
        h = nn.relu(Conv(self.odim, (5, 5), strides=(3, 3), padding="VALID")(h))
        b, t, f, c = h.shape
        h = nn.Dense(self.odim)(h.reshape(b, t, f * c))
        if mask is not None:
            mask = mask[:, :-2:2][:, :-4:3]
        return h, mask


class Conv2dSubsampling8(nn.Module):
    """1/8 time reduction (three stride-2 convs)."""

    odim: int

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray]):
        h = x[..., None]
        for _ in range(3):
            h = nn.relu(Conv(self.odim, (3, 3), strides=(2, 2), padding="VALID")(h))
        b, t, f, c = h.shape
        h = nn.Dense(self.odim)(h.reshape(b, t, f * c))
        if mask is not None:
            mask = mask[:, :-2:2][:, :-2:2][:, :-2:2]
        return h, mask


def _make_pos_enc(kind: str, d: int, rate: float, init_alpha: float = 1.0):
    if kind == "abs":
        return PositionalEncoding(d, rate)
    if kind == "scaled":
        return ScaledPositionalEncoding(d, rate, init_alpha)
    if kind == "rel_pos":
        return RelPositionalEncoding(d, rate)
    if kind == "legacy_rel_pos":
        return LegacyRelPositionalEncoding(d, rate)
    raise ValueError(f"unknown pos_enc type: {kind}")


class EncoderLayer(nn.Module):
    """Pre/post-LN transformer encoder block with optional rel-pos attention."""

    size: int
    n_head: int
    linear_units: int
    dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    normalize_before: bool = True
    concat_after: bool = False
    positionwise_layer_type: str = "linear"
    positionwise_conv_kernel_size: int = 1
    selfattention_layer_type: str = "selfattn"
    stochastic_depth_rate: float = 0.0
    attention_backend: str = "xla"
    flash_min_len: int = -1  # <0: module default (see nn/attention.py)
    dtype: Any = None  # computation dtype (LN stats stay fp32)

    def setup(self):
        extra = (
            {} if self.flash_min_len < 0
            else {"flash_train_min_len": self.flash_min_len}
        )
        if self.selfattention_layer_type == "selfattn":
            self.self_attn = MultiHeadedAttention(
                self.n_head, self.size, self.attention_dropout_rate,
                backend=self.attention_backend, dtype=self.dtype, **extra,
            )
        elif self.selfattention_layer_type == "rel_selfattn":
            self.self_attn = RelPositionMultiHeadedAttention(
                self.n_head, self.size, self.attention_dropout_rate,
                dtype=self.dtype,
            )
        elif self.selfattention_layer_type == "legacy_rel_selfattn":
            self.self_attn = LegacyRelPositionMultiHeadedAttention(
                self.n_head, self.size, self.attention_dropout_rate,
                dtype=self.dtype,
            )
        else:
            raise ValueError(self.selfattention_layer_type)
        self.feed_forward = _positionwise(
            self.positionwise_layer_type,
            self.linear_units,
            self.dropout_rate,
            self.positionwise_conv_kernel_size,
            self.dtype,
        )
        self.norm1 = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype)
        self.norm2 = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype)
        self.dropout = nn.Dropout(self.dropout_rate)
        if self.concat_after:
            self.concat_linear = nn.Dense(self.size, dtype=self.dtype)

    def _maybe_skip(self, deterministic: bool):
        if deterministic or self.stochastic_depth_rate == 0.0:
            return False, 1.0
        skip = jax.random.bernoulli(
            self.make_rng("dropout"), self.stochastic_depth_rate
        )
        return skip, 1.0 / (1.0 - self.stochastic_depth_rate)

    def __call__(self, x, mask, pos_emb=None, deterministic: bool = True):
        skip, coeff = self._maybe_skip(deterministic)

        def run(x):
            residual = x
            h = self.norm1(x) if self.normalize_before else x
            if pos_emb is not None:
                att = self.self_attn(h, h, h, pos_emb, mask, deterministic=deterministic)
            else:
                att = self.self_attn(h, h, h, mask, deterministic=deterministic)
            if self.concat_after:
                h = residual + coeff * self.concat_linear(
                    jnp.concatenate([h, att], axis=-1)
                )
            else:
                h = residual + coeff * self.dropout(att, deterministic=deterministic)
            if not self.normalize_before:
                h = self.norm1(h)

            residual = h
            f = self.norm2(h) if self.normalize_before else h
            f = residual + coeff * self.dropout(
                self.feed_forward(f, deterministic=deterministic),
                deterministic=deterministic,
            )
            if not self.normalize_before:
                f = self.norm2(f)
            return f

        if isinstance(skip, bool):
            return x if skip else run(x)
        return jax.lax.cond(skip, lambda x: x, run, x)


class Encoder(nn.Module):
    """Transformer encoder (reference ``transformer/encoder.py:29``)."""

    idim: int
    attention_dim: int = 256
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 6
    dropout_rate: float = 0.1
    positional_dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    input_layer: Optional[str] = "conv2d"
    pos_enc_type: str = "abs"  # abs | scaled | rel_pos | legacy_rel_pos
    normalize_before: bool = True
    concat_after: bool = False
    positionwise_layer_type: str = "linear"
    positionwise_conv_kernel_size: int = 1
    selfattention_layer_type: str = "selfattn"
    padding_idx: int = 0
    stochastic_depth_rate: float = 0.0
    init_enc_alpha: float = 1.0
    attention_backend: str = "xla"  # 'flash' = Pallas kernels at long T
    flash_min_len: int = -1  # <0: module default (see nn/attention.py)
    # computation dtype (e.g. jnp.bfloat16): bf16 residual stream, fp32
    # params/LN stats; the final output is cast back to fp32.
    dtype: Any = None

    @property
    def conv_subsampling_factor(self) -> int:
        return 4 if self.input_layer in ("conv2d", "conv2d-scaled-pos-enc") else 1

    def setup(self):
        if self.input_layer == "linear":
            self.pre = nn.Dense(self.attention_dim)
            # plain torch.nn.LayerNorm (eps 1e-5) in the reference embed
            # Sequential (transformer/encoder.py:99-105)
            self.pre_norm = nn.LayerNorm(epsilon=1e-5)
        elif self.input_layer in ("conv2d", "conv2d-scaled-pos-enc"):
            self.subsample = Conv2dSubsampling(self.attention_dim)
        elif self.input_layer == "embed":
            self.embed_tokens = nn.Embed(self.idim, self.attention_dim)
        elif self.input_layer is not None:
            raise ValueError(f"unknown input_layer: {self.input_layer}")
        pos_kind = self.pos_enc_type
        if self.input_layer == "conv2d-scaled-pos-enc" and pos_kind == "abs":
            pos_kind = "scaled"
        self.pos_enc = _make_pos_enc(
            pos_kind, self.attention_dim, self.positional_dropout_rate, self.init_enc_alpha
        )
        self.layers = [
            EncoderLayer(
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
                self.stochastic_depth_rate,
                self.attention_backend,
                flash_min_len=self.flash_min_len,
                dtype=self.dtype,
            )
            for _ in range(self.num_blocks)
        ]
        if self.normalize_before:
            self.after_norm = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype)
        self.input_dropout = nn.Dropout(self.dropout_rate)

    def __call__(self, xs, masks: Optional[jnp.ndarray], deterministic: bool = True):
        """Encode.

        Args:
            xs: (B, T, idim) features or (B, T) int tokens for 'embed'.
            masks: (B, T) bool non-pad mask or None.
        Returns:
            (hs, out_masks): (B, T', adim) and subsampled (B, T') mask.
        """
        if self.input_layer == "linear":
            xs = nn.relu(
                self.input_dropout(
                    self.pre_norm(self.pre(xs)), deterministic=deterministic
                )
            )
        elif self.input_layer in ("conv2d", "conv2d-scaled-pos-enc"):
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
        for layer in self.layers:
            xs = layer(xs, attn_mask, pos_emb=pos_emb, deterministic=deterministic)
        if self.normalize_before:
            xs = self.after_norm(xs)
        xs = xs.astype(jnp.float32)
        return xs, masks


class DecoderLayer(nn.Module):
    """Decoder block: masked self-attn + cross-attn + FFN (pre/post-LN)."""

    size: int
    n_head: int
    linear_units: int
    dropout_rate: float = 0.1
    self_attention_dropout_rate: float = 0.0
    src_attention_dropout_rate: float = 0.0
    normalize_before: bool = True
    concat_after: bool = False
    dtype: Any = None  # computation dtype (LN stats stay fp32)

    def setup(self):
        self.self_attn = MultiHeadedAttention(
            self.n_head, self.size, self.self_attention_dropout_rate,
            dtype=self.dtype,
        )
        self.src_attn = MultiHeadedAttention(
            self.n_head, self.size, self.src_attention_dropout_rate,
            dtype=self.dtype,
        )
        self.feed_forward = PositionwiseFeedForward(
            self.linear_units, self.dropout_rate, dtype=self.dtype
        )
        self.norm1 = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype)
        self.norm2 = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype)
        self.norm3 = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype)
        self.dropout = nn.Dropout(self.dropout_rate)
        if self.concat_after:
            self.concat_linear1 = nn.Dense(self.size, dtype=self.dtype)
            self.concat_linear2 = nn.Dense(self.size, dtype=self.dtype)

    def __call__(
        self,
        tgt,
        tgt_mask,
        memory,
        memory_mask,
        deterministic: bool = True,
        return_attns: bool = False,
    ):
        # self attention
        residual = tgt
        x = self.norm1(tgt) if self.normalize_before else tgt
        sa, sa_w = self.self_attn(
            x, x, x, tgt_mask, deterministic=deterministic, return_weights=True
        )
        if self.concat_after:
            x = residual + self.concat_linear1(jnp.concatenate([x, sa], axis=-1))
        else:
            x = residual + self.dropout(sa, deterministic=deterministic)
        if not self.normalize_before:
            x = self.norm1(x)

        # source attention
        residual = x
        h = self.norm2(x) if self.normalize_before else x
        ca, ca_w = self.src_attn(
            h, memory, memory, memory_mask, deterministic=deterministic, return_weights=True
        )
        if self.concat_after:
            x = residual + self.concat_linear2(jnp.concatenate([h, ca], axis=-1))
        else:
            x = residual + self.dropout(ca, deterministic=deterministic)
        if not self.normalize_before:
            x = self.norm2(x)

        # feed forward
        residual = x
        f = self.norm3(x) if self.normalize_before else x
        x = residual + self.dropout(
            self.feed_forward(f, deterministic=deterministic), deterministic=deterministic
        )
        if not self.normalize_before:
            x = self.norm3(x)

        if return_attns:
            return x, sa_w, ca_w
        return x

    def step(
        self,
        x_t: jnp.ndarray,
        t: jnp.ndarray,
        k_cache: jnp.ndarray,
        v_cache: jnp.ndarray,
        mem_k: jnp.ndarray,
        mem_v: jnp.ndarray,
        memory_mask: Optional[jnp.ndarray],
    ):
        """One incremental decode step with a fixed-size KV cache.

        Args:
            x_t: (B, 1, size) current input frame state.
            t: scalar int32 step index.
            k_cache, v_cache: (B, H, maxlen, dh) self-attention cache.
            mem_k, mem_v: (B, H, Tmem, dh) precomputed cross K/V.
            memory_mask: (B, Tmem) bool or None.

        Returns:
            (y_t (B, 1, size), new_k_cache, new_v_cache, cross_attn_w).
        """
        residual = x_t
        x = self.norm1(x_t) if self.normalize_before else x_t
        k_new, v_new = self.self_attn.project_kv(x, x)  # (B, H, 1, dh)
        k_cache = jax.lax.dynamic_update_slice(k_cache, k_new, (0, 0, t, 0))
        v_cache = jax.lax.dynamic_update_slice(v_cache, v_new, (0, 0, t, 0))
        maxlen = k_cache.shape[2]
        valid = (jnp.arange(maxlen) <= t)[None, None, None, :]  # (1,1,1,maxlen)
        from .attention import _split_heads, _merge_heads
        from ..ops.attention import scaled_dot_attention

        qh = _split_heads(self.self_attn.linear_q(x), self.n_head)
        sa = _merge_heads(scaled_dot_attention(qh, k_cache, v_cache, mask=valid))
        sa = self.self_attn.linear_out(sa)
        x = residual + sa
        if not self.normalize_before:
            x = self.norm1(x)

        residual = x
        h = self.norm2(x) if self.normalize_before else x
        qh = _split_heads(self.src_attn.linear_q(h), self.n_head)
        mmask = None if memory_mask is None else memory_mask[:, None, None, :]
        ca, ca_w = scaled_dot_attention(qh, mem_k, mem_v, mask=mmask, return_weights=True)
        ca = self.src_attn.linear_out(_merge_heads(ca))
        x = residual + ca
        if not self.normalize_before:
            x = self.norm2(x)

        residual = x
        f = self.norm3(x) if self.normalize_before else x
        x = residual + self.feed_forward(f, deterministic=True)
        if not self.normalize_before:
            x = self.norm3(x)
        return x, k_cache, v_cache, ca_w


class Decoder(nn.Module):
    """Transformer decoder (reference ``transformer/decoder.py:35``).

    ``input_layer``: 'linear' (Dense on feature frames), 'embed' (token
    embedding), or None (inputs are already adim-sized — the caller applies
    its own prenet, as VTN does).
    """

    odim: int
    attention_dim: int = 256
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 6
    dropout_rate: float = 0.1
    positional_dropout_rate: float = 0.1
    self_attention_dropout_rate: float = 0.0
    src_attention_dropout_rate: float = 0.0
    input_layer: Optional[str] = None
    use_output_layer: bool = False
    pos_enc_type: str = "scaled"
    normalize_before: bool = True
    concat_after: bool = False
    init_dec_alpha: float = 1.0
    dtype: Any = None  # computation dtype (LN stats fp32; output fp32)

    def setup(self):
        if self.input_layer == "linear":
            self.pre = nn.Dense(self.attention_dim)
        elif self.input_layer == "embed":
            self.embed_tokens = nn.Embed(self.odim, self.attention_dim)
        self.pos_enc = _make_pos_enc(
            self.pos_enc_type,
            self.attention_dim,
            self.positional_dropout_rate,
            self.init_dec_alpha,
        )
        self.layers = [
            DecoderLayer(
                self.attention_dim,
                self.attention_heads,
                self.linear_units,
                self.dropout_rate,
                self.self_attention_dropout_rate,
                self.src_attention_dropout_rate,
                self.normalize_before,
                self.concat_after,
                dtype=self.dtype,
            )
            for _ in range(self.num_blocks)
        ]
        if self.normalize_before:
            self.after_norm = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype)
        if self.use_output_layer:
            self.output_layer = nn.Dense(self.odim)

    def _embed(self, tgt, deterministic: bool):
        if self.input_layer == "linear":
            tgt = self.pre(tgt)
        elif self.input_layer == "embed":
            tgt = self.embed_tokens(tgt)
        return self.pos_enc(tgt, deterministic=deterministic)

    def __call__(
        self,
        tgt,
        tgt_mask,
        memory,
        memory_mask,
        deterministic: bool = True,
        return_attns: bool = False,
    ):
        """Teacher-forcing decode.

        Args:
            tgt: (B, T, adim or odim) decoder inputs (already prenet'ed if
                input_layer is None).
            tgt_mask: (B, T, T) bool combined causal+pad mask.
            memory: (B, Tmem, adim) encoder states.
            memory_mask: (B, Tmem) bool non-pad.
        """
        x = self._embed(tgt, deterministic)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        mem_mask = None if memory_mask is None else memory_mask[:, None, :]
        self_ws, src_ws = [], []
        for layer in self.layers:
            x, sw, cw = layer(
                x, tgt_mask, memory, mem_mask,
                deterministic=deterministic, return_attns=True,
            )
            self_ws.append(sw)
            src_ws.append(cw)
        if self.normalize_before:
            x = self.after_norm(x)
        x = x.astype(jnp.float32)
        if self.use_output_layer:
            x = self.output_layer(x)
        if return_attns:
            return x, self_ws, src_ws
        return x

    def init_cache(self, batch: int, maxlen: int) -> Dict[str, Any]:
        dh = self.attention_dim // self.attention_heads
        zeros = jnp.zeros(
            (batch, self.attention_heads, maxlen, dh), self.dtype or jnp.float32
        )
        return {
            "k": jnp.stack([zeros] * self.num_blocks),
            "v": jnp.stack([zeros] * self.num_blocks),
        }

    def precompute_memory(self, memory) -> Dict[str, jnp.ndarray]:
        """Project cross-attention K/V once per utterance."""
        ks, vs = [], []
        for layer in self.layers:
            k, v = layer.src_attn.project_kv(memory, memory)
            ks.append(k)
            vs.append(v)
        return {"mk": jnp.stack(ks), "mv": jnp.stack(vs)}

    def step(
        self,
        y_t: jnp.ndarray,
        t: jnp.ndarray,
        cache: Dict[str, jnp.ndarray],
        mem_kv: Dict[str, jnp.ndarray],
        memory_mask: Optional[jnp.ndarray] = None,
    ):
        """One AR step. y_t: (B, 1, adim) already-embedded input frame
        (prenet + projection applied by the caller); positional encoding for
        index t is added here.

        Returns: (z_t (B, adim), new_cache, cross_attn_w stacked (L, B, H, 1, Tmem)).
        """
        if self.pos_enc_type not in ("scaled", "abs"):
            raise ValueError(f"step() unsupported pos_enc_type {self.pos_enc_type}")
        x = self.pos_enc.encode_at(y_t, t, cache["k"].shape[3])
        if self.dtype is not None:
            x = x.astype(self.dtype)

        new_k, new_v, cross_ws = [], [], []
        for i, layer in enumerate(self.layers):
            x, k_c, v_c, cw = layer.step(
                x, t, cache["k"][i], cache["v"][i],
                mem_kv["mk"][i], mem_kv["mv"][i], memory_mask,
            )
            new_k.append(k_c)
            new_v.append(v_c)
            cross_ws.append(cw)
        if self.normalize_before:
            x = self.after_norm(x)
        x = x.astype(jnp.float32)
        new_cache = {"k": jnp.stack(new_k), "v": jnp.stack(new_v)}
        return x[:, 0], new_cache, jnp.stack(cross_ws)

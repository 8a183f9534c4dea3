"""Multi-head attention modules (flax.linen).

Same computation as reference ``modules/transformer/attention.py:15,114,209``
but with two TPU-first changes: (1) the attention map is an explicit return
value instead of a stored module attribute (jit-pure), and (2) incremental
decoding uses a real fixed-size KV cache written with dynamic_update_slice
(the reference instead re-runs every layer over the whole prefix each step —
``modules/transformer/decoder_layer.py:204-218``).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import scaled_dot_attention

# Flash dispatch threshold (key length), env-overridable for experiments
# (S2S_FLASH_MIN_LEN). Measured on v5e: TRAINING (scripts/profile_train.py,
# bf16) — at T=512 the full AAS-VC step is 82.8 ms with XLA attention vs
# 111.6 ms with the flash fwd+bwd kernels, at T=1024 103 vs 158 ms;
# INFERENCE (scripts/bench_ablate.py, round 3) — the NAR decode bench runs
# 177.6k mel-f/s through XLA vs 139.3k through the flash kernels (latest
# rel-pos; legacy 174.2k vs 127.4k). XLA's fused dense attention wins in
# BOTH modes while the score matrices fit comfortably in HBM; the flash
# kernels are the long-context path where the (B, H, T, T)/(B, H, T, 2T-1)
# tensors approach HBM limits, so `attention_backend: flash` routes to
# them only at T >= FLASH_MIN_LEN regardless of train/inference mode.
import os as _os

FLASH_MIN_LEN = int(
    _os.environ.get(
        "S2S_FLASH_MIN_LEN", _os.environ.get("S2S_FLASH_TRAIN_MIN_LEN", "3072")
    )
)
FLASH_TRAIN_MIN_LEN = FLASH_MIN_LEN  # back-compat alias

# backward variant for the fused rel-scores kernel (attention_backend:
# fused): 'xla' rebuilds the (T, 2T-1) band cotangent once (the dense
# backward's traffic), 'banded' never materializes it, 'auto' (default)
# length-gates between them at the chip-measured crossover (xla below
# T=768, banded above — see ops/rel_scores.py AUTO_BANDED_MIN_LEN; A/B:
# xla 76.0 vs banded 76.7 ms/step at B16xT512, banded 194.1 vs xla 206.9
# at B16xT960). 'pallas' (the legacy diagonal-reduction pair) is
# catastrophic on the chip (2081 ms/step) and kept for A/B history only.
REL_SCORES_BWD = _os.environ.get("S2S_REL_SCORES_BWD", "auto")
# fused-kernel tile size CAP (clamped per call to the 128-rounded T so
# short buckets don't over-pad). Chip A/B at the B16xT512 flagship:
# block 128 -> 78.2 ms/step, 256 -> 77.2, 512 -> 76.4 (vs 84.1 dense)
REL_SCORES_BLOCK = int(_os.environ.get("S2S_REL_SCORES_BLOCK", "512"))


def _split_heads(x: jnp.ndarray, n_head: int) -> jnp.ndarray:
    b, t, d = x.shape
    return x.reshape(b, t, n_head, d // n_head).transpose(0, 2, 1, 3)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, h, t, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * dh)


def _expand_mask(mask: Optional[jnp.ndarray]) -> Optional[jnp.ndarray]:
    """Broadcast a (B, Tk) / (B, Tq, Tk) / (B, 1, Tk) mask to (B, 1, Tq, Tk)."""
    if mask is None:
        return None
    if mask.ndim == 2:
        mask = mask[:, None, :]
    return mask[:, None, :, :]


class MultiHeadedAttention(nn.Module):
    """Standard scaled dot-product MHA with q/k/v/out projections.

    ``backend='flash'`` routes through the Pallas flash-attention kernel
    when the call qualifies: no attention-weight output needed, the mask
    (if any) is a key-padding mask, and — for non-deterministic (training)
    calls — the key length reaches ``flash_train_min_len`` (the kernels
    support dropout + backward, but XLA measures faster below that size).
    Otherwise it falls back to the XLA path transparently.
    """

    n_head: int
    n_feat: int
    dropout_rate: float = 0.0
    backend: str = "xla"  # 'xla' | 'flash'
    # computation dtype for the projections and the AV matmul; scores and
    # softmax always accumulate in fp32 (params stay fp32 regardless)
    dtype: Any = None
    # min key length for the flash path (train AND inference); see
    # FLASH_MIN_LEN for the measurements behind the default
    flash_train_min_len: int = FLASH_MIN_LEN

    def setup(self):
        self.linear_q = nn.Dense(self.n_feat, dtype=self.dtype)
        self.linear_k = nn.Dense(self.n_feat, dtype=self.dtype)
        self.linear_v = nn.Dense(self.n_feat, dtype=self.dtype)
        self.linear_out = nn.Dense(self.n_feat, dtype=self.dtype)
        self.attn_dropout = nn.Dropout(self.dropout_rate)

    def _qkv(self, query, key, value):
        q = _split_heads(self.linear_q(query), self.n_head)
        k = _split_heads(self.linear_k(key), self.n_head)
        v = _split_heads(self.linear_v(value), self.n_head)
        return q, k, v

    def __call__(
        self,
        query,
        key,
        value,
        mask=None,
        deterministic: bool = True,
        return_weights: bool = False,
    ):
        q, k, v = self._qkv(query, key, value)
        if (
            self.backend == "flash"
            and not return_weights
            and key.shape[1] >= self.flash_train_min_len
            and (mask is None or mask.ndim == 2 or (mask.ndim == 3 and mask.shape[1] == 1))
        ):
            from ..ops.flash_attention import flash_attention

            kv_lens = None
            if mask is not None:
                m2 = mask if mask.ndim == 2 else mask[:, 0, :]
                kv_lens = m2.sum(-1).astype(jnp.int32)  # prefix-true padding mask
            rate = 0.0 if deterministic else float(self.dropout_rate)
            seed = None
            if rate > 0.0:
                # in-kernel dropout: the Pallas kernel derives the mask from
                # this seed (see ops/flash_attention.py), fwd == bwd
                seed = jax.random.randint(
                    self.make_rng("dropout"), (1,), 0, np.iinfo(np.int32).max,
                    dtype=jnp.int32,
                )
            out = flash_attention(
                q, k, v, kv_lens=kv_lens, dropout_rate=rate, dropout_seed=seed
            )
            return self.linear_out(_merge_heads(out))
        out, w = scaled_dot_attention(q, k, v, mask=_expand_mask(mask), return_weights=True)
        if not deterministic and self.dropout_rate > 0.0:
            w = self.attn_dropout(w, deterministic=False)
            out = jnp.einsum(
                "bhqk,bhkd->bhqd",
                w.astype(v.dtype),
                v,
                preferred_element_type=jnp.float32,
            ).astype(v.dtype)
        out = self.linear_out(_merge_heads(out))
        if return_weights:
            return out, w
        return out

    def project_kv(self, key, value) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Head-split K/V projections, for building decode caches."""
        k = _split_heads(self.linear_k(key), self.n_head)
        v = _split_heads(self.linear_v(value), self.n_head)
        return k, v

    def attend_with_kv(self, query, k, v, mask=None):
        """Attention with externally cached K/V (incremental decode path)."""
        q = _split_heads(self.linear_q(query), self.n_head)
        out = scaled_dot_attention(q, k, v, mask=_expand_mask(mask))
        return self.linear_out(_merge_heads(out))


def rel_shift(x: jnp.ndarray, legacy: bool = False) -> jnp.ndarray:
    """Relative-position score shift (Transformer-XL trick).

    New style: (B, H, T, 2T-1) scores against ±(T-1) positions -> (B, H, T, T).
    Legacy: (B, H, T, T) -> (B, H, T, T).
    """
    b, h, t, n = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))
    x = x.reshape(b, h, n + 1, t)
    x = x[:, :, 1:, :].reshape(b, h, t, n)
    if legacy:
        return x
    return x[:, :, :, : (n + 1) // 2]


class RelPositionMultiHeadedAttention(nn.Module):
    """MHA with Transformer-XL relative position encoding (new style).

    Expects pos_emb of shape (1, 2T-1, n_feat) from RelPositionalEncoding.
    """

    n_head: int
    n_feat: int
    dropout_rate: float = 0.0
    zero_triu: bool = False
    legacy: bool = False
    # 'xla' (dense), 'fused' (Pallas fused-scores kernel: dense softmax/AV
    # but the (T, 2T-1) band never materializes — ops/rel_scores.py), or
    # 'flash' (full flash kernel at T >= flash_train_min_len)
    backend: str = "xla"
    dtype: Any = None  # computation dtype; scores/softmax stay fp32
    flash_train_min_len: int = FLASH_MIN_LEN  # see FLASH_MIN_LEN (both modes)
    # sequence parallelism: when a mesh is given, the attention runs as a
    # shard_map'd ring over the mesh's `sp_axis` (time axis sharded; K/V
    # blocks rotate over ICI) — parallel/ring_attention.ring_rel_attention.
    # New-style rel-pos only; the time axis must divide by the axis size.
    sp_mesh: Any = None
    sp_axis: str = "seq"

    @nn.compact
    def __call__(
        self,
        query,
        key,
        value,
        pos_emb,
        mask=None,
        deterministic: bool = True,
        return_weights: bool = False,
    ):
        d_k = self.n_feat // self.n_head
        q = _split_heads(
            nn.Dense(self.n_feat, dtype=self.dtype, name="linear_q")(query), self.n_head
        )
        k = _split_heads(
            nn.Dense(self.n_feat, dtype=self.dtype, name="linear_k")(key), self.n_head
        )
        v = _split_heads(
            nn.Dense(self.n_feat, dtype=self.dtype, name="linear_v")(value), self.n_head
        )
        p = _split_heads(
            nn.Dense(
                self.n_feat, use_bias=False, dtype=self.dtype, name="linear_pos"
            )(pos_emb.astype(q.dtype)),
            self.n_head,
        )  # (1, H, 2T-1 or T, d_k)

        pos_bias_u = self.param(
            "pos_bias_u", nn.initializers.xavier_uniform(), (self.n_head, d_k)
        )
        pos_bias_v = self.param(
            "pos_bias_v", nn.initializers.xavier_uniform(), (self.n_head, d_k)
        )

        q_u = q + pos_bias_u[None, :, None, :].astype(q.dtype)
        q_v = q + pos_bias_v[None, :, None, :].astype(q.dtype)

        if (
            self.sp_mesh is not None
            and not self.zero_triu
            and not return_weights
            and (mask is None or mask.ndim == 2 or (mask.ndim == 3 and mask.shape[1] == 1))
        ):
            if self.legacy:
                raise NotImplementedError(
                    "sequence_parallel supports the new-style rel-pos "
                    "attention only (conformer_rel_pos_type: latest)"
                )
            from jax.experimental.shard_map import shard_map
            from jax.sharding import PartitionSpec as P

            from ..parallel.ring_attention import ring_rel_attention

            if mask is None:
                kv_lens = jnp.full((key.shape[0],), key.shape[1], jnp.int32)
            else:
                m2 = mask if mask.ndim == 2 else mask[:, 0, :]
                kv_lens = m2.sum(-1).astype(jnp.int32)
            rate = 0.0 if deterministic else float(self.dropout_rate)
            if rate > 0.0:
                seed = jax.random.randint(
                    self.make_rng("dropout"), (1,), 0, np.iinfo(np.int32).max,
                    dtype=jnp.int32,
                )
            else:
                seed = jnp.zeros((1,), jnp.int32)
            sp_ax = self.sp_axis

            def _ring(qu, qv, k_, v_, p_, lens_, seed_):
                return ring_rel_attention(
                    qu, qv, k_, v_, p_, lens_, axis_name=sp_ax,
                    dropout_rate=rate, dropout_seed=seed_,
                )

            # every mesh axis must be mentioned in the specs: an unmentioned
            # axis with check_rep=False over-counts cotangents by its size
            # (observed 2x grads with an idle model axis). Heads shard over
            # 'model' (TP x SP composition), batch over 'data'.
            model_size = self.sp_mesh.shape.get("model", 1)
            if self.n_head % model_size != 0:
                raise ValueError(
                    f"aheads ({self.n_head}) must divide by the mesh model "
                    f"axis ({model_size}) when sequence_parallel is on"
                )
            tspec = P("data", "model", sp_ax, None)
            out = shard_map(
                _ring,
                mesh=self.sp_mesh,
                in_specs=(tspec, tspec, tspec, tspec, P("model"), P("data"), P()),
                out_specs=tspec,
                check_rep=False,
            )(q_u, q_v, k, v, p[0], kv_lens, seed)
            return nn.Dense(self.n_feat, dtype=self.dtype, name="linear_out")(
                _merge_heads(out)
            )

        # Best-of routing, chip-measured (full train step, B2, bf16 —
        # docs/LONGCONTEXT.md): the fused-scores kernel is the FASTEST
        # variant at every measured long T (114.8 vs xla 126.2 / flash
        # 148.6 ms at T2048; 236.4 vs 276.8 / 316.8 at T3072; 362.4 vs
        # 423.3 / 485.8 at T4096), so 'fused' never reroutes to flash.
        # 'flash' keeps its memory-lean semantics: at T >=
        # flash_train_min_len it takes the flash kernels (temp memory
        # ~40-50% below fused — 4.3 vs 7.0 GB at T3072 — the
        # OOM-avoidance path the shipped confs rely on at batch scale),
        # and below the gate falls through to fused, which also wins
        # there (76.4 vs 84.1 ms/step dense at the B16xT512 flagship).
        if (
            self.backend == "flash"
            and not self.zero_triu
            and not return_weights
            and key.shape[1] >= self.flash_train_min_len
            and (mask is None or mask.ndim == 2 or (mask.ndim == 3 and mask.shape[1] == 1))
        ):
            from ..ops.flash_attention import rel_flash_attention

            kv_lens = None
            if mask is not None:
                m2 = mask if mask.ndim == 2 else mask[:, 0, :]
                kv_lens = m2.sum(-1).astype(jnp.int32)
            rate = 0.0 if deterministic else float(self.dropout_rate)
            seed = None
            if rate > 0.0:
                seed = jax.random.randint(
                    self.make_rng("dropout"), (1,), 0, np.iinfo(np.int32).max,
                    dtype=jnp.int32,
                )
            out = rel_flash_attention(
                q_u, q_v, k, v, p[0], kv_lens=kv_lens, legacy=self.legacy,
                dropout_rate=rate, dropout_seed=seed,
            )
            return nn.Dense(self.n_feat, dtype=self.dtype, name="linear_out")(
                _merge_heads(out)
            )
        if (
            (
                self.backend == "fused"
                # flash below its length gate falls through here — but only
                # on TPU: on CPU the Pallas kernel runs in interpret mode
                # (slow), while the dense XLA band is cheap
                or (self.backend == "flash" and jax.default_backend() != "cpu")
            )
            and not self.legacy
            and not self.zero_triu
            and key.shape[1] == query.shape[1]
            and pos_emb.shape[1] == 2 * query.shape[1] - 1
        ):
            # fused-scores path: the (B, H, T, 2T-1) matrix_bd of the dense
            # branch below never materializes (ops/rel_scores.py); the
            # mask/softmax/dropout/AV pipeline after it is shared, so
            # training semantics are identical up to fp reassociation
            from ..ops.rel_scores import fused_rel_scores

            scores = fused_rel_scores(
                q_u, q_v, k, p[0], block=REL_SCORES_BLOCK, bwd=REL_SCORES_BWD
            )
        else:
            matrix_ac = jnp.einsum(
                "bhqd,bhkd->bhqk", q_u, k, preferred_element_type=jnp.float32
            )
            matrix_bd = jnp.einsum(
                "bhqd,bhpd->bhqp", q_v, p, preferred_element_type=jnp.float32
            )
            matrix_bd = rel_shift(matrix_bd, legacy=self.legacy)
            if self.zero_triu:
                tri = jnp.tril(jnp.ones(matrix_bd.shape[-2:], matrix_bd.dtype))
                matrix_bd = matrix_bd * tri[None, None]

            scores = (matrix_ac + matrix_bd) / jnp.sqrt(
                jnp.asarray(d_k, jnp.float32)
            )
        m = _expand_mask(mask)
        if m is not None:
            scores = jnp.where(m, scores, -1e9)
        w = nn.softmax(scores, axis=-1)
        if m is not None:
            w = jnp.where(m, w, 0.0)
        w = nn.Dropout(self.dropout_rate)(w, deterministic=deterministic)
        out = jnp.einsum(
            "bhqk,bhkd->bhqd",
            w.astype(v.dtype),
            v,
            preferred_element_type=jnp.float32,
        ).astype(v.dtype)
        out = nn.Dense(self.n_feat, dtype=self.dtype, name="linear_out")(_merge_heads(out))
        if return_weights:
            return out, w
        return out


class LegacyRelPositionMultiHeadedAttention(RelPositionMultiHeadedAttention):
    """Legacy variant: pos_emb of shape (1, T, n_feat), legacy rel-shift."""

    legacy: bool = True

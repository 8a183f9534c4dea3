"""Native HuBERT-soft content encoder (flax) + torch checkpoint converter.

Replaces the reference's external ``torch.hub.load("bshall/hubert:main",
"hubert_soft")`` (reference ``urhythmic/urhythmic_encode.py:112``,
``urhythmic/model.py:22-36``) so the urhythmic encode stage runs in-image.

Architecture: HuBERT-base (CNN wave encoder -> feature projection ->
conv-positional transformer encoder, post-LN) + the HuBERT-soft head (a
768->256 linear projection for soft units and a 100-cluster label embedding
whose scaled cosine similarities give the discrete-unit logits).

Weight conversion supports two torch layouts:
- HuggingFace ``transformers.HubertModel`` naming (numerically verified in
  tests against a randomly initialized torch model — no download needed);
- the bshall/hubert checkpoint naming (same tensors, different prefixes).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# hubert-base constants (HF facebook/hubert-base-ls960 config)
CONV_DIM = (512, 512, 512, 512, 512, 512, 512)
CONV_KERNEL = (10, 3, 3, 3, 3, 2, 2)
CONV_STRIDE = (5, 2, 2, 2, 2, 2, 2)
HIDDEN = 768
N_LAYERS = 12
N_HEADS = 12
FFN = 3072
LN_EPS = 1e-5
POS_CONV_KERNEL = 128
POS_CONV_GROUPS = 16
SOFT_DIM = 256
N_CLUSTERS = 100
LOGIT_TEMP = 0.1
SAMPLING_RATE = 16000
HOP = 320  # total feature-extractor stride


def conv_stack_frames(n):
    """Valid output frame count of the conv stack for ``n`` input samples
    (VALID convs: every returned frame reads only the first ``n`` samples).
    Works on ints or integer arrays."""
    for k, s in zip(CONV_KERNEL, CONV_STRIDE):
        n = (n - k) // s + 1
    return n


class _InstanceNorm(nn.Module):
    """Per-(item, channel) norm over time == GroupNorm(group_size=1), with
    optional masked statistics over the first ``n_valid`` frames (so a
    tail-padded batch reproduces the exact-length statistics). Param names
    match flax GroupNorm for checkpoint compatibility."""

    @nn.compact
    def __call__(self, h, n_valid=None):
        C = h.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        if n_valid is None:
            mean = h.mean(axis=1, keepdims=True)
            var = h.var(axis=1, keepdims=True)
        else:
            mask = (
                jnp.arange(h.shape[1])[None, :] < n_valid[:, None]
            )[..., None].astype(h.dtype)
            cnt = jnp.maximum(n_valid, 1).astype(h.dtype)[:, None, None]
            mean = (h * mask).sum(axis=1, keepdims=True) / cnt
            var = (jnp.square(h - mean) * mask).sum(axis=1, keepdims=True) / cnt
        return (h - mean) * jax.lax.rsqrt(var + LN_EPS) * scale + bias


class _FeatureEncoder(nn.Module):
    """7-layer strided conv stack over the raw waveform (group-norm first)."""

    @nn.compact
    def __call__(self, x, lengths=None):  # x: (B, T)
        h = x[:, :, None]  # (B, T, 1)
        n_valid = lengths
        for i, (dim, k, s) in enumerate(zip(CONV_DIM, CONV_KERNEL, CONV_STRIDE)):
            h = nn.Conv(dim, (k,), strides=(s,), padding="VALID", use_bias=False,
                        name=f"conv{i}")(h)
            if n_valid is not None:
                n_valid = (n_valid - k) // s + 1
            if i == 0:
                # GroupNorm(num_groups=channels) == per-channel instance
                # norm; masked stats keep tail-padded batches exact
                h = _InstanceNorm(name="group_norm")(h, n_valid)
            h = nn.gelu(h, approximate=False)
        return h  # (B, N, 512)


class _SelfAttention(nn.Module):
    @nn.compact
    def __call__(self, x, key_mask=None):
        d_k = HIDDEN // N_HEADS
        q = nn.Dense(HIDDEN, name="q_proj")(x)
        k = nn.Dense(HIDDEN, name="k_proj")(x)
        v = nn.Dense(HIDDEN, name="v_proj")(x)

        def split(t):
            B, T, _ = t.shape
            return t.reshape(B, T, N_HEADS, d_k).transpose(0, 2, 1, 3)

        q, k, v = split(q) / np.sqrt(d_k), split(k), split(v)
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        )
        if key_mask is not None:  # (B, T) True = valid
            logits = jnp.where(key_mask[:, None, None, :], logits, -1e9)
        w = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", w, v)
        B, H, T, D = o.shape
        o = o.transpose(0, 2, 1, 3).reshape(B, T, H * D)
        return nn.Dense(HIDDEN, name="out_proj")(o)


class _EncoderLayer(nn.Module):
    """Post-LN transformer layer (do_stable_layer_norm=False)."""

    @nn.compact
    def __call__(self, x, key_mask=None):
        x = x + _SelfAttention(name="attention")(x, key_mask)
        x = nn.LayerNorm(epsilon=LN_EPS, name="layer_norm")(x)
        h = nn.Dense(FFN, name="ffn_in")(x)
        h = nn.gelu(h, approximate=False)
        x = x + nn.Dense(HIDDEN, name="ffn_out")(h)
        return nn.LayerNorm(epsilon=LN_EPS, name="final_layer_norm")(x)


class HubertSoft(nn.Module):
    """HuBERT-soft: soft-unit extraction + discrete-unit logits."""

    def setup(self):
        self.feature_extractor = _FeatureEncoder()
        self.fp_norm = nn.LayerNorm(epsilon=LN_EPS)
        self.fp_proj = nn.Dense(HIDDEN)
        self.pos_conv = nn.Conv(
            HIDDEN, (POS_CONV_KERNEL,), padding=[(POS_CONV_KERNEL // 2,) * 2],
            feature_group_count=POS_CONV_GROUPS,
        )
        self.enc_norm = nn.LayerNorm(epsilon=LN_EPS)
        self.layers = [_EncoderLayer(name=f"layer_{i}") for i in range(N_LAYERS)]
        self.proj = nn.Dense(SOFT_DIM)
        self.label_embedding = self.param(
            "label_embedding", nn.initializers.normal(1.0), (N_CLUSTERS, SOFT_DIM)
        )

    def encode(self, wav, output_layer: Optional[int] = None, lengths=None):
        """wav (B, T) in [-1, 1] -> hidden states (B, N, 768).

        ``output_layer=k`` taps the k-th transformer layer's output
        (1-based), the PPG-style feature used by s3prl-type upstreams
        (reference ``bin/preprocess.py:184-196`` takes a featurizer over
        upstream hidden states; here a single layer tap).

        ``lengths`` (B,) valid sample counts makes a TAIL-PADDED batch
        produce exact-length outputs on the valid frame prefix
        (``conv_stack_frames(lengths)`` frames): VALID convs are
        length-safe, the instance norm uses masked stats, padded frames
        are zeroed before the pos-conv (matching the exact run's conv
        zero-padding), and attention masks padded keys. This bounds the
        compiled-shape set for corpus extraction — without it every
        distinct utterance length recompiles."""
        h = self.feature_extractor(wav, lengths)
        h = self.fp_proj(self.fp_norm(h))
        key_mask = None
        if lengths is not None:
            n_valid = conv_stack_frames(lengths)
            key_mask = jnp.arange(h.shape[1])[None, :] < n_valid[:, None]
            # zero padded frames: the exact-length run's SAME pos-conv sees
            # zeros beyond the boundary, so this reproduces it exactly
            h = jnp.where(key_mask[..., None], h, 0.0)
        pos = self.pos_conv(h)
        if POS_CONV_KERNEL % 2 == 0:
            # even kernel + symmetric pad yields one extra frame; HF's
            # HubertSamePadLayer drops the last one
            pos = pos[:, :-1]
        h = h + nn.gelu(pos, approximate=False)
        h = self.enc_norm(h)
        for i, layer in enumerate(self.layers):
            h = layer(h, key_mask)
            if output_layer is not None and i + 1 == output_layer:
                return h
        return h

    def units(self, wav, lengths=None):
        """wav (B, T) -> soft units (B, N, 256). Pads by (400-320)//2 per
        side like bshall HubertSoft.units."""
        pad = (400 - HOP) // 2
        wav = jnp.pad(wav, ((0, 0), (pad, pad)))
        if lengths is not None:
            lengths = lengths + 2 * pad
        return self.proj(self.encode(wav, lengths=lengths))

    def logits(self, units):
        """Cosine similarity to the cluster embeddings / temperature."""
        u = units / jnp.linalg.norm(units, axis=-1, keepdims=True).clip(1e-8)
        e = self.label_embedding / jnp.linalg.norm(
            self.label_embedding, axis=-1, keepdims=True
        ).clip(1e-8)
        return jnp.einsum("bnd,kd->bnk", u, e) / LOGIT_TEMP

    def __call__(self, wav, lengths=None):
        units = self.units(wav, lengths=lengths)
        return units, jax.nn.log_softmax(self.logits(units), axis=-1)


def _t(x):
    return np.asarray(x, np.float32)


def convert_torch_hubert(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """torch HuBERT(-soft) state dict -> flax params for HubertSoft.

    Accepts HF ``HubertModel`` naming (``feature_extractor.conv_layers...``,
    ``encoder.layers.N...``) or bshall naming; missing soft-head tensors
    (HF base models have no proj/label_embedding) get zero-init stand-ins.
    """
    sd = {k: v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
          for k, v in state_dict.items()}

    def pick(*names):
        for n in names:
            if n in sd:
                return sd[n]
        return None

    p: Dict[str, Any] = {}
    fe: Dict[str, Any] = {}
    for i in range(len(CONV_DIM)):
        w = pick(
            f"feature_extractor.conv_layers.{i}.conv.weight",
            f"feature_extractor.conv{i}.weight",
            f"hubert.feature_extractor.conv_layers.{i}.conv.weight",
        )
        # torch conv1d (out, in, k) -> flax (k, in, out)
        fe[f"conv{i}"] = {"kernel": _t(w).transpose(2, 1, 0)}
    gw = pick(
        "feature_extractor.conv_layers.0.layer_norm.weight",
        "feature_extractor.norm0.weight",
        "hubert.feature_extractor.conv_layers.0.layer_norm.weight",
    )
    gb = pick(
        "feature_extractor.conv_layers.0.layer_norm.bias",
        "feature_extractor.norm0.bias",
        "hubert.feature_extractor.conv_layers.0.layer_norm.bias",
    )
    fe["group_norm"] = {"scale": _t(gw), "bias": _t(gb)}
    p["feature_extractor"] = fe

    p["fp_norm"] = {
        "scale": _t(pick("feature_projection.layer_norm.weight",
                         "feature_projection.norm.weight")),
        "bias": _t(pick("feature_projection.layer_norm.bias",
                        "feature_projection.norm.bias")),
    }
    p["fp_proj"] = {
        "kernel": _t(pick("feature_projection.projection.weight")).T,
        "bias": _t(pick("feature_projection.projection.bias")),
    }

    # positional conv: HF stores weight-norm (weight_g/weight_v) or
    # parametrized originals; reconstruct the dense kernel
    wg = pick("encoder.pos_conv_embed.conv.weight_g",
              "encoder.pos_conv_embed.conv.parametrizations.weight.original0",
              "positional_embedding.conv.weight_g")
    wv = pick("encoder.pos_conv_embed.conv.weight_v",
              "encoder.pos_conv_embed.conv.parametrizations.weight.original1",
              "positional_embedding.conv.weight_v")
    if wg is not None and wv is not None:
        wv = _t(wv)
        wg = _t(wg)
        norm = np.sqrt((wv ** 2).sum(axis=(0, 1), keepdims=True)).clip(1e-12)
        w = wv / norm * wg
    else:
        w = _t(pick("encoder.pos_conv_embed.conv.weight",
                    "positional_embedding.conv.weight"))
    p["pos_conv"] = {
        "kernel": w.transpose(2, 1, 0),
        "bias": _t(pick("encoder.pos_conv_embed.conv.bias",
                        "positional_embedding.conv.bias")),
    }
    p["enc_norm"] = {
        "scale": _t(pick("encoder.layer_norm.weight", "norm.weight")),
        "bias": _t(pick("encoder.layer_norm.bias", "norm.bias")),
    }

    for i in range(N_LAYERS):
        hf = f"encoder.layers.{i}"
        bs = f"encoder.layers.{i}"  # bshall uses torch TransformerEncoder naming

        def lin(hf_name, bs_name):
            w = pick(f"{hf}.{hf_name}.weight", f"{bs}.{bs_name}.weight")
            b = pick(f"{hf}.{hf_name}.bias", f"{bs}.{bs_name}.bias")
            return {"kernel": _t(w).T, "bias": _t(b)}

        layer: Dict[str, Any] = {"attention": {}}
        if pick(f"{bs}.self_attn.in_proj_weight") is not None:
            # torch nn.MultiheadAttention packed qkv (bshall layout)
            W = _t(pick(f"{bs}.self_attn.in_proj_weight"))
            B_ = _t(pick(f"{bs}.self_attn.in_proj_bias"))
            for j, nm in enumerate(("q_proj", "k_proj", "v_proj")):
                layer["attention"][nm] = {
                    "kernel": W[j * HIDDEN : (j + 1) * HIDDEN].T,
                    "bias": B_[j * HIDDEN : (j + 1) * HIDDEN],
                }
            layer["attention"]["out_proj"] = lin(
                "attention.out_proj", "self_attn.out_proj"
            )
            layer["layer_norm"] = {
                "scale": _t(pick(f"{bs}.norm1.weight")),
                "bias": _t(pick(f"{bs}.norm1.bias")),
            }
            layer["final_layer_norm"] = {
                "scale": _t(pick(f"{bs}.norm2.weight")),
                "bias": _t(pick(f"{bs}.norm2.bias")),
            }
            layer["ffn_in"] = lin("feed_forward.intermediate_dense", "linear1")
            layer["ffn_out"] = lin("feed_forward.output_dense", "linear2")
        else:
            for nm in ("q_proj", "k_proj", "v_proj", "out_proj"):
                layer["attention"][nm] = lin(f"attention.{nm}", f"attention.{nm}")
            layer["layer_norm"] = {
                "scale": _t(pick(f"{hf}.layer_norm.weight")),
                "bias": _t(pick(f"{hf}.layer_norm.bias")),
            }
            layer["final_layer_norm"] = {
                "scale": _t(pick(f"{hf}.final_layer_norm.weight")),
                "bias": _t(pick(f"{hf}.final_layer_norm.bias")),
            }
            layer["ffn_in"] = lin("feed_forward.intermediate_dense",
                                  "feed_forward.intermediate_dense")
            layer["ffn_out"] = lin("feed_forward.output_dense",
                                   "feed_forward.output_dense")
        p[f"layer_{i}"] = layer

    pw = pick("proj.weight")
    p["proj"] = {
        "kernel": _t(pw).T if pw is not None else np.zeros((HIDDEN, SOFT_DIM), np.float32),
        "bias": _t(pick("proj.bias")) if pick("proj.bias") is not None
        else np.zeros((SOFT_DIM,), np.float32),
    }
    le = pick("label_embedding.weight")
    p["label_embedding"] = (
        _t(le) if le is not None else np.zeros((N_CLUSTERS, SOFT_DIM), np.float32)
    )
    return {"params": p}


def load_hubert_soft(checkpoint_path: str) -> Tuple[HubertSoft, Dict[str, Any]]:
    """Load a torch HuBERT-soft checkpoint (.pt/.ckpt) into the flax model."""
    import torch

    ckpt = torch.load(checkpoint_path, map_location="cpu", weights_only=False)
    sd = ckpt.get("hubert", ckpt.get("state_dict", ckpt)) if isinstance(ckpt, dict) else ckpt
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    # resident weights: host-numpy params passed as jit args re-upload
    # ~380 MB over the axon tunnel on EVERY encode_batch call (r5 finding)
    return HubertSoft(), jax.device_put(convert_torch_hubert(sd))


def encode_batch(model: HubertSoft, params, wav: np.ndarray,
                 bucket_samples: int = 16000, lengths=None):
    """wav (T,) or (B, T) -> (units (B, N, 256), log_probs (B, N, 100),
    n_frames (B,) valid unit counts).

    The sample axis is zero-padded to a ``bucket_samples`` multiple and the
    model runs with masked lengths, so corpus extraction compiles one
    program per bucket instead of one per distinct utterance length (the
    valid unit prefix matches an exact-length forward — see
    ``HubertSoft.encode``). Pass ``lengths`` (B,) when rows of ``wav`` are
    already tail-padded to a common length."""
    wav = np.asarray(wav, np.float32)
    if wav.ndim == 1:
        wav = wav[None]
    if lengths is None:
        lengths = np.full((wav.shape[0],), wav.shape[1], np.int32)
    else:
        lengths = np.asarray(lengths, np.int32)
    if bucket_samples and wav.shape[1] % bucket_samples:
        tb = ((wav.shape[1] + bucket_samples - 1) // bucket_samples) * bucket_samples
        wav = np.pad(wav, ((0, 0), (0, tb - wav.shape[1])))
    pad = (400 - HOP) // 2
    n_frames = conv_stack_frames(lengths + 2 * pad)
    fn = _JIT_CACHE.get(id(model))
    if fn is None:
        fn = jax.jit(model.apply)
        _JIT_CACHE[id(model)] = fn
    units, log_probs = fn(params, jnp.asarray(wav), jnp.asarray(lengths))
    return units, log_probs, jnp.asarray(n_frames)


_JIT_CACHE: Dict[int, Any] = {}

"""Native ppg_sxliu upstream: wav -> phonetic-posteriorgram features.

The reference extracts ``ppg_sxliu`` features through the external s3prl-vc
package (``bin/preprocess.py:184-196``): ``get_upstream('ppg_sxliu')`` — a
conformer ASR encoder vendored from liusongxiang/ppg-vc — produces one
hidden-state sequence per layer, and an ``s3prl.nn.Featurizer`` (trained
with the downstream, stored under the ``featurizer`` key of s3prl-vc
checkpoints) collapses them with softmax layer weights.

This module is the TPU-native equivalent:

- :class:`PPGUpstream` — log-mel-fbank frontend + espnet-style conformer
  encoder (the repo's :class:`~seq2seq_vc_tpu.nn.conformer.ConformerEncoder`
  IS that architecture), returning the per-layer hidden states.
- :class:`Featurizer` — softmax-weighted layer sum (s3prl semantics).
- :func:`load_ppg_upstream` — builds the model FROM a torch checkpoint,
  inferring layer count / widths / conv kernel / macaron use from the
  state_dict itself, and converts the weights by explicit espnet parameter
  name (reusing ``convert/reference.py``'s conformer mapping — the
  upstream's modules are espnet code, the same family as the reference's
  ``modules/conformer``).

Caveat (documented, same class as the Taco2-AR weights): the fbank
frontend parameters default to the common 80-dim / 25 ms / 10 ms setup;
exact parity with the shipped s3prl-vc upstream can only be asserted
against its real checkpoint + config, neither of which can be downloaded
in this image. The conformer conversion itself is proven against the live
reference conformer modules in ``tests/test_ppg.py``.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..nn.conformer import ConformerEncoder


def log_mel_fbank(
    wav: jnp.ndarray,
    sample_rate: int = 16000,
    n_mels: int = 80,
    frame_length: int = 400,
    frame_shift: int = 160,
    fft_size: int = 512,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
    eps: float = 1e-10,
) -> jnp.ndarray:
    """(T_samples,) -> (T_frames, n_mels) log-mel filterbank (jittable).

    Hann window, reflect padding to center frames, natural-log compression
    — the standard ASR frontend family (25 ms / 10 ms at 16 kHz defaults).
    """
    from ..dsp.mel import mel_filterbank

    pad = fft_size // 2
    x = jnp.pad(wav, (pad, pad), mode="reflect")
    n_frames = 1 + (x.shape[0] - fft_size) // frame_shift
    idx = (
        jnp.arange(n_frames)[:, None] * frame_shift + jnp.arange(fft_size)[None, :]
    )
    frames = x[idx]
    win = jnp.hanning(frame_length).astype(jnp.float32)
    win = jnp.pad(win, (0, fft_size - frame_length))
    spec = jnp.abs(jnp.fft.rfft(frames * win[None, :], n=fft_size))
    fb = jnp.asarray(
        mel_filterbank(sample_rate, fft_size, n_mels, fmin, fmax or sample_rate / 2)
    )
    return jnp.log(jnp.maximum(spec @ fb.T, eps))


class PPGUpstream(nn.Module):
    """Conformer ASR encoder over fbank features, exposing all layer states.

    ``__call__`` takes (T_frames, n_mels) fbank features (see
    :func:`log_mel_fbank`) with a batch axis and returns the list
    ``[embed_out, block_1, ..., block_N]`` — the hidden-state stack the
    s3prl featurizer consumes (one entry per layer + the embed output).
    """

    input_dim: int = 80
    adim: int = 256
    aheads: int = 4
    eunits: int = 2048
    elayers: int = 12
    input_layer: str = "conv2d"
    macaron_style: bool = True
    use_cnn_module: bool = True
    cnn_module_kernel: int = 15
    positionwise_layer_type: str = "linear"

    def setup(self):
        self.encoder = ConformerEncoder(
            idim=self.input_dim,
            attention_dim=self.adim,
            attention_heads=self.aheads,
            linear_units=self.eunits,
            num_blocks=self.elayers,
            input_layer=self.input_layer,
            dropout_rate=0.0,
            positional_dropout_rate=0.0,
            attention_dropout_rate=0.0,
            macaron_style=self.macaron_style,
            pos_enc_layer_type="rel_pos",
            selfattention_layer_type="rel_selfattn",
            use_cnn_module=self.use_cnn_module,
            cnn_module_kernel=self.cnn_module_kernel,
            positionwise_layer_type=self.positionwise_layer_type,
            conv_norm_type="batch_norm",  # espnet conformer uses BN
        )

    def __call__(
        self, feats: jnp.ndarray, masks: Optional[jnp.ndarray] = None
    ) -> List[jnp.ndarray]:
        enc = self.encoder
        xs = feats
        if enc.input_layer == "linear":
            xs = enc.input_dropout(enc.pre_norm(enc.pre(xs)), deterministic=True)
        elif enc.input_layer == "conv2d":
            xs, masks = enc.subsample(xs, masks)
        out = enc.pos_enc(xs, deterministic=True)
        xs, pos_emb = out if isinstance(out, tuple) else (out, None)
        attn_mask = None if masks is None else masks[:, None, :]
        states = [xs]
        for layer in enc.layers:
            xs = layer(xs, attn_mask, pos_emb, True)
            states.append(xs)
        if enc.normalize_before:
            states[-1] = enc.after_norm(states[-1])
        return states


class Featurizer:
    """s3prl ``Featurizer``: softmax layer weights collapse the state stack.

    Weights come from the ``featurizer`` entry of an s3prl-vc checkpoint
    (``torch.load(ckpt)['featurizer']['weights']``).
    """

    def __init__(self, weights: np.ndarray):
        self.weights = np.asarray(weights, np.float32)

    def __call__(self, states: List[jnp.ndarray]) -> jnp.ndarray:
        n = len(states)
        if self.weights.shape[0] != n:
            raise ValueError(
                f"featurizer has {self.weights.shape[0]} layer weights but the "
                f"upstream produced {n} states — upstream architecture mismatch"
            )
        w = jax.nn.softmax(jnp.asarray(self.weights))
        return sum(wi * s for wi, s in zip(w, states))


# ------------------------------------------------------------------ loading
def _strip_prefix(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Normalize to espnet-encoder keys rooted at ``encoder.``."""
    for prefix in ("model.", "e2e.", "ppg_model."):
        if all(k.startswith(prefix) for k in sd):
            sd = {k[len(prefix):]: v for k, v in sd.items()}
    if not any(k.startswith("encoder.") for k in sd):
        raise KeyError(
            "no 'encoder.*' keys in the upstream state_dict — not an "
            f"espnet-style PPG model (keys: {sorted(sd)[:8]}...)"
        )
    # drop non-encoder heads (CTC/decoder of the ASR model — the upstream
    # interface only exposes encoder states)
    return {k: v for k, v in sd.items() if k.startswith("encoder.")}


def infer_architecture(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Read the conformer hyperparameters out of an espnet state_dict."""
    n_blocks = 1 + max(
        int(k.split(".")[2]) for k in sd if k.startswith("encoder.encoders.")
    )
    first = "encoder.encoders.0."
    adim = int(np.shape(sd[first + "norm_mha.weight"])[0])
    aheads_guess = None
    w1 = sd.get(first + "feed_forward.w_1.weight")
    eunits = int(np.shape(w1)[0])
    pw_kind = "conv1d" if np.ndim(w1) == 3 else "linear"
    macaron = (first + "feed_forward_macaron.w_1.weight") in sd
    use_cnn = (first + "conv_module.pointwise_conv1.weight") in sd
    kernel = (
        int(np.shape(sd[first + "conv_module.depthwise_conv.weight"])[-1])
        if use_cnn else 31
    )
    if "encoder.embed.conv.0.weight" in sd:
        input_layer = "conv2d"
        input_dim = None  # recovered below from the post-conv linear
        f2 = int(np.shape(sd["encoder.embed.out.0.weight"])[1]) // adim
        # invert the two stride-2 VALID convs: f2 = ((idim-1)//2 - 1)//2
        input_dim = f2 * 4 + 3  # smallest idim consistent with f2 (see test)
    else:
        input_layer = "linear"
        input_dim = int(np.shape(sd["encoder.embed.0.weight"])[1])
    # heads: pos_bias_u is (H, d_k)
    pb = sd.get(first + "self_attn.pos_bias_u")
    aheads_guess = int(np.shape(pb)[0]) if pb is not None else 4
    return dict(
        input_dim=input_dim, adim=adim, aheads=aheads_guess, eunits=eunits,
        elayers=n_blocks, input_layer=input_layer, macaron_style=macaron,
        use_cnn_module=use_cnn, cnn_module_kernel=kernel,
        positionwise_layer_type=pw_kind,
    )


def load_ppg_upstream(
    checkpoint: str, input_dim: Optional[int] = None
) -> Tuple[PPGUpstream, Dict[str, Any]]:
    """Build + convert the upstream from a torch checkpoint file.

    Accepts a raw state_dict or common wrappers ({'model': ...},
    {'state_dict': ...}). ``input_dim`` overrides the fbank dimension when
    the conv2d input layer makes it ambiguous (idim -> f' is 4-to-1).
    """
    import torch

    from ..convert.reference import _conformer_encoder, _StateDict

    obj = torch.load(checkpoint, map_location="cpu", weights_only=False)
    sd = obj
    for key in ("model", "state_dict"):
        if isinstance(sd, dict) and key in sd:
            sd = sd[key]
    sd = {k: v for k, v in sd.items()}
    sd = _strip_prefix(sd)
    arch = infer_architecture(sd)
    if input_dim is not None:
        arch["input_dim"] = input_dim
    model = PPGUpstream(**arch)

    wrapped = _StateDict(sd)
    params, stats = _conformer_encoder(
        wrapped, "encoder",
        input_layer=arch["input_layer"],
        num_blocks=arch["elayers"],
        normalize_before=True,
        concat_after=False,
        pw_kind=arch["positionwise_layer_type"],
        macaron=arch["macaron_style"],
        use_cnn=arch["use_cnn_module"],
        conv_norm_type="batch_norm",
        adim=arch["adim"],
    )
    wrapped.finish()
    variables: Dict[str, Any] = {"params": {"encoder": params}}
    if stats:
        variables["batch_stats"] = {"encoder": stats}
    return model, jax.tree_util.tree_map(jnp.asarray, variables)


def load_featurizer(checkpoint: str) -> Featurizer:
    """Featurizer weights from an s3prl-vc downstream checkpoint
    (``['featurizer']['weights']``) or a bare featurizer state_dict."""
    import torch

    obj = torch.load(checkpoint, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "featurizer" in obj:
        obj = obj["featurizer"]
    if hasattr(obj, "keys") and "weights" in obj:
        w = obj["weights"]
    else:
        raise KeyError(
            "no featurizer weights found in checkpoint (expected "
            "['featurizer']['weights'] as saved by s3prl-vc)"
        )
    return Featurizer(np.asarray(w.detach().cpu() if hasattr(w, "detach") else w))


def build_extractor(
    upstream_ckpt: str,
    featurizer_ckpt: str,
    sample_rate: int = 16000,
    input_dim: Optional[int] = None,
):
    """wav (numpy, 16 kHz) -> PPG features (numpy), the full reference
    pipeline (upstream all-layer states + trained featurizer weights)."""
    model, variables = load_ppg_upstream(upstream_ckpt, input_dim=input_dim)
    featurizer = load_featurizer(featurizer_ckpt)

    # NOTE: deliberately jitted at the exact sample length (one compile per
    # distinct utterance length, amortized by the persistent compilation
    # cache). Unlike HuBERT (VALID-conv frontend -> mask-exact bucketing,
    # urhythmic/hubert.py), this frontend reflect-pads to center fbank
    # frames, so tail-padding the wav perturbs the last frames' features
    # and, through the conv2d subsample, the feature tail — parity with
    # the s3prl extraction wins over compile reuse here.
    @jax.jit
    def _run(wav):
        feats = log_mel_fbank(
            wav, sample_rate=sample_rate, n_mels=model.input_dim
        )
        states = model.apply(variables, feats[None])
        return featurizer([s[0] for s in states])

    def extract(wav: np.ndarray) -> np.ndarray:
        return np.asarray(_run(jnp.asarray(wav, jnp.float32)))

    return extract

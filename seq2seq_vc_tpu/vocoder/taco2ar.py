"""Taco2-AR downstream model: upstream latents -> mel (flax).

Stage-1 of the two-stage feat2wav path (reference
``vocoder/s3prl_feat2wav.py:104-141`` instantiates
``s3prl_vc.models.Taco2_AR`` from an external checkpoint). This is a native
port of that downstream (the Taco2-AR model of A2A-VC / s3prl-vc): linear
resampling of the upstream features to the mel frame rate, a Tacotron2
encoder (linear embed -> 3x[conv5 + norm + relu + dropout] -> BLSTM), and
an autoregressive decoder (always-on prenet on the previous mel frame, 2
unidirectional LSTM cells, linear projection with encoder skip connection).

The AR loop is a ``lax.scan`` with static shapes (TPU-jittable end to end).
``convert_torch_taco2ar`` maps an s3prl-vc torch checkpoint into the flax
params by EXPLICIT torch parameter name (LSTM ih/hh, fwd/bwd directions and
BatchNorm running stats all land where they belong, with loud failure on
any unknown name); ``tests/test_taco2ar.py`` proves output parity against
a live torch replica of the upstream architecture.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def linear_resample(x: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """(T, D) -> (out_len, D) linear interpolation (torch F.interpolate
    ``mode='linear', align_corners=False`` semantics)."""
    t_in = x.shape[0]
    scale = t_in / out_len
    pos = (jnp.arange(out_len) + 0.5) * scale - 0.5
    pos = jnp.clip(pos, 0.0, t_in - 1.0)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, t_in - 1)
    w = (pos - lo)[:, None]
    return x[lo] * (1.0 - w) + x[hi] * w


def _lstm_params(module: nn.Module, prefix: str, d_in: int, hidden: int):
    return (
        module.param(f"{prefix}_wih", nn.initializers.xavier_uniform(), (4 * hidden, d_in)),
        module.param(f"{prefix}_whh", nn.initializers.orthogonal(), (4 * hidden, hidden)),
        module.param(f"{prefix}_bih", nn.initializers.zeros, (4 * hidden,)),
        module.param(f"{prefix}_bhh", nn.initializers.zeros, (4 * hidden,)),
    )


def _lstm_cell(params, x, h, c):
    """One torch-gate-order (i, f, g, o) LSTM cell step."""
    wih, whh, bih, bhh = params
    gates = x @ wih.T + bih + h @ whh.T + bhh
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h = jax.nn.sigmoid(o) * jnp.tanh(c)
    return h, c


def _lstm_scan(params, x):
    """Unidirectional LSTM over (B, T, D)."""
    hidden = params[1].shape[1]
    h0 = jnp.zeros((x.shape[0], hidden), x.dtype)

    def step(carry, xt):
        h, c = _lstm_cell(params, xt, *carry)
        return (h, c), h

    _, ys = jax.lax.scan(step, (h0, h0), x.transpose(1, 0, 2))
    return ys.transpose(1, 0, 2)


class Taco2AR(nn.Module):
    """s3prl-vc Taco2-AR downstream: latents (B, T, D) -> mel (B, T', odim).

    ``resample_ratio`` = latent frame rate / mel frame rate (the inverse of
    the reference's ``s3prl_feat2wav.py:48-52`` expression).
    """

    input_dim: int
    output_dim: int = 80
    resample_ratio: float = 1.0
    encoder_conv_layers: int = 3
    encoder_conv_chans: int = 512
    encoder_conv_filts: int = 5
    encoder_units: int = 512
    decoder_layers: int = 2
    decoder_units: int = 1024
    prenet_layers: int = 2
    prenet_units: int = 256
    prenet_dropout_rate: float = 0.5
    dropout_rate: float = 0.5
    # 'group_norm' (TPU default, pad-invariant) or 'batch_norm' (torch
    # checkpoint parity: eval-mode running stats from 'batch_stats')
    norm_type: str = "group_norm"

    @nn.compact
    def __call__(self, latents, out_len: Optional[int] = None, rng=None,
                 deterministic: bool = True):
        """AR greedy decode. latents: (B, T, input_dim); returns (B, T', odim)
        with T' = round(T / resample_ratio) unless ``out_len`` is given."""
        B, T, _ = latents.shape
        t_out = out_len or max(int(round(T / self.resample_ratio)), 1)

        # ---- encoder ----
        x = jax.vmap(lambda s: linear_resample(s, t_out))(latents)
        x = nn.Dense(self.encoder_conv_chans, name="embed")(x)
        for i in range(self.encoder_conv_layers):
            x = nn.Conv(
                self.encoder_conv_chans, (self.encoder_conv_filts,),
                padding="SAME", use_bias=False, name=f"conv{i}",
            )(x)
            if self.norm_type == "group_norm":
                # per-sample GroupNorm(1) replaces BatchNorm (repo
                # convention: pad-invariant and pjit-pure; nn/conformer.py)
                x = nn.GroupNorm(num_groups=1, name=f"norm{i}")(x)
            elif self.norm_type == "batch_norm":
                x = nn.BatchNorm(
                    use_running_average=deterministic, name=f"norm{i}"
                )(x)
            else:
                raise ValueError(self.norm_type)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        half = self.encoder_units // 2
        fwd = _lstm_scan(_lstm_params(self, "enc_lstm_fwd", x.shape[-1], half), x)
        bwd = _lstm_scan(
            _lstm_params(self, "enc_lstm_bwd", x.shape[-1], half), x[:, ::-1]
        )[:, ::-1]
        enc = jnp.concatenate([fwd, bwd], axis=-1)  # (B, T', eunits)

        # ---- AR decoder ----
        H = self.decoder_units
        cells = []
        for i in range(self.decoder_layers):
            d_in = enc.shape[-1] + self.prenet_units if i == 0 else H
            cells.append(_lstm_params(self, f"dec_lstm{i}", d_in, H))
        prenet_ps = [
            (
                self.param(
                    f"prenet_fc{i}_kernel", nn.initializers.xavier_uniform(),
                    (self.output_dim if i == 0 else self.prenet_units, self.prenet_units),
                ),
                self.param(f"prenet_fc{i}_bias", nn.initializers.zeros, (self.prenet_units,)),
            )
            for i in range(self.prenet_layers)
        ]
        proj_k = self.param(
            "proj_kernel", nn.initializers.xavier_uniform(),
            (enc.shape[-1] + H, self.output_dim),
        )
        proj_b = self.param("proj_bias", nn.initializers.zeros, (self.output_dim,))
        if rng is None:
            rng = (
                self.make_rng("dropout") if self.has_rng("dropout")
                else jax.random.PRNGKey(0)
            )
        keep_p = 1.0 - self.prenet_dropout_rate

        def step(carry, enc_t):
            prev, states, key = carry
            p = prev
            # Tacotron2 prenet: dropout stays ON at inference (AR smoother)
            for kern, bias in prenet_ps:
                key, sub = jax.random.split(key)
                p = nn.relu(p @ kern + bias)
                keep = jax.random.bernoulli(sub, keep_p, p.shape)
                p = jnp.where(keep, p / keep_p, 0.0)
            x = jnp.concatenate([enc_t, p], axis=-1)
            new_states = []
            for params, (h, c) in zip(cells, states):
                h, c = _lstm_cell(params, x, h, c)
                new_states.append((h, c))
                x = h
            out = jnp.concatenate([enc_t, x], axis=-1) @ proj_k + proj_b
            return (out, tuple(new_states), key), out

        zeros = jnp.zeros((B, self.output_dim))
        states0 = tuple(
            (jnp.zeros((B, H)), jnp.zeros((B, H))) for _ in range(self.decoder_layers)
        )
        _, outs = jax.lax.scan(step, (zeros, states0, rng), enc.transpose(1, 0, 2))
        return outs.transpose(1, 0, 2)


# --------------------------------------------------------------- conversion
def convert_torch_taco2ar(state_dict: Dict[str, Any], model: Taco2AR,
                          example_latents: np.ndarray = None) -> Dict[str, Any]:
    """Name-based torch->flax conversion for s3prl-vc Taco2-AR checkpoints.

    Every tensor is matched by its EXPLICIT torch parameter name (never by
    shape — identically-shaped LSTM ih/hh or fwd/bwd tensors would silently
    cross-wire under shape matching). Expected layout, following the
    upstream s3prl-vc ``models/taco2.py`` / espnet Tacotron2 structure:

    - ``encoder.embed.{weight,bias}`` — input Linear.
    - ``encoder.convs.{i}.0.weight`` — Conv1d (bias=False);
      ``encoder.convs.{i}.1.{weight,bias,running_mean,running_var}`` —
      BatchNorm1d (requires ``norm_type='batch_norm'`` on the model; the
      running stats go to the ``batch_stats`` collection).
    - ``encoder.blstm.{weight_ih_l0,weight_hh_l0,bias_ih_l0,bias_hh_l0}``
      (+ ``_reverse``) — bidirectional torch.nn.LSTM, forward direction
      first, torch gate order (i, f, g, o) kept as-is (the flax cell uses
      the same order).
    - ``decoder.lstms.{i}.{weight_ih,weight_hh,bias_ih,bias_hh}`` —
      torch.nn.LSTMCell stack (``decoder.lstm.{i}.*`` also accepted).
    - ``decoder.prenet.prenet.{i}.0.{weight,bias}`` — prenet Linears
      (``decoder.prenet.{i}.0.*`` also accepted).
    - ``decoder.proj.{weight,bias}`` — output projection.

    Raises KeyError / ValueError listing the offending names when the
    checkpoint uses a different layout — never decodes garbage silently.
    """
    del example_latents  # layout is name-driven; kept for API compat
    sd = {
        k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
        for k, v in state_dict.items()
        if not k.endswith("num_batches_tracked")
    }

    def pop(name):
        try:
            return sd.pop(name)
        except KeyError:
            raise KeyError(
                f"torch parameter {name!r} not found in the Taco2-AR "
                f"checkpoint (remaining: {sorted(sd)[:8]}...)"
            ) from None

    def pop_any(*names):
        for n in names:
            if n in sd:
                return sd.pop(n)
        raise KeyError(
            f"none of {names} found in the Taco2-AR checkpoint "
            f"(remaining: {sorted(sd)[:8]}...)"
        )

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    params["embed"] = {
        "kernel": pop("encoder.embed.weight").T,
        "bias": pop("encoder.embed.bias"),
    }
    for i in range(model.encoder_conv_layers):
        w = pop(f"encoder.convs.{i}.0.weight")  # (out, in, k)
        params[f"conv{i}"] = {"kernel": w.transpose(2, 1, 0)}
        norm = {
            "scale": pop(f"encoder.convs.{i}.1.weight"),
            "bias": pop(f"encoder.convs.{i}.1.bias"),
        }
        if f"encoder.convs.{i}.1.running_mean" in sd:
            if model.norm_type != "batch_norm":
                raise ValueError(
                    "checkpoint contains encoder BatchNorm running stats; "
                    "build the Taco2AR with norm_type='batch_norm' (the "
                    "GroupNorm default cannot represent them)"
                )
            stats[f"norm{i}"] = {
                "mean": pop(f"encoder.convs.{i}.1.running_mean"),
                "var": pop(f"encoder.convs.{i}.1.running_var"),
            }
        params[f"norm{i}"] = norm

    # bidirectional LSTM: torch packs forward (no suffix) and backward
    # ('_reverse') directions; each is (4H, in)/(4H, H) in (i, f, g, o)
    # gate order — identical to the flax cell, so no gate permutation
    for flax_prefix, suffix in (("enc_lstm_fwd", ""), ("enc_lstm_bwd", "_reverse")):
        params[f"{flax_prefix}_wih"] = pop(f"encoder.blstm.weight_ih_l0{suffix}")
        params[f"{flax_prefix}_whh"] = pop(f"encoder.blstm.weight_hh_l0{suffix}")
        params[f"{flax_prefix}_bih"] = pop(f"encoder.blstm.bias_ih_l0{suffix}")
        params[f"{flax_prefix}_bhh"] = pop(f"encoder.blstm.bias_hh_l0{suffix}")

    for i in range(model.decoder_layers):
        for part in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
            tgt = {"weight_ih": "wih", "weight_hh": "whh",
                   "bias_ih": "bih", "bias_hh": "bhh"}[part]
            params[f"dec_lstm{i}_{tgt}"] = pop_any(
                f"decoder.lstms.{i}.{part}", f"decoder.lstm.{i}.{part}"
            )

    for i in range(model.prenet_layers):
        w = pop_any(
            f"decoder.prenet.prenet.{i}.0.weight", f"decoder.prenet.{i}.0.weight"
        )
        b = pop_any(
            f"decoder.prenet.prenet.{i}.0.bias", f"decoder.prenet.{i}.0.bias"
        )
        params[f"prenet_fc{i}_kernel"] = w.T
        params[f"prenet_fc{i}_bias"] = b

    params["proj_kernel"] = pop("decoder.proj.weight").T
    params["proj_bias"] = pop("decoder.proj.bias")

    if sd:
        raise ValueError(
            f"unconverted torch tensors (unexpected layout): {sorted(sd)}"
        )
    out = {"params": jax.tree_util.tree_map(jnp.asarray, params)}
    if stats:
        out["batch_stats"] = jax.tree_util.tree_map(jnp.asarray, stats)
    return out


def build_downstream(checkpoint: str, config: Dict[str, Any],
                     stats_mean: np.ndarray, stats_scale: np.ndarray):
    """Factory for ``S3PRL_Feat2Wav``'s stage-1 callable from a torch ckpt.

    config keys mirror the reference downstream YAML: ``model_type`` (only
    Taco2_AR is ported), ``num_mels``, ``model_params``, and the frame-rate
    fields combined exactly like reference ``s3prl_feat2wav.py:45-53``.
    """
    import torch

    if config.get("model_type", "Taco2_AR") != "Taco2_AR":
        raise NotImplementedError(
            f"downstream model_type {config.get('model_type')!r}: only "
            "Taco2_AR is ported natively"
        )
    obj = torch.load(checkpoint, map_location="cpu", weights_only=False)
    sd = obj["model"] if isinstance(obj, dict) and "model" in obj else obj

    upstream_rate = float(config.get("upstream_rate", 160))  # samples/frame @16k
    mel_per_latent = (
        config["sampling_rate"] / config["hop_size"] * upstream_rate / 16000.0
    )
    params = config.get("model_params", {})
    try:
        embed_w = sd["encoder.embed.weight"]
    except KeyError:
        raise KeyError(
            "checkpoint lacks 'encoder.embed.weight' — not an s3prl-vc "
            f"Taco2-AR state_dict (keys: {sorted(sd)[:8]}...)"
        ) from None
    has_bn = any(k.endswith("running_mean") for k in sd)
    model = Taco2AR(
        input_dim=int(embed_w.shape[1]),
        output_dim=int(config.get("num_mels", 80)),
        resample_ratio=1.0 / mel_per_latent if mel_per_latent else 1.0,
        norm_type="batch_norm" if has_bn else "group_norm",
        **{k: v for k, v in params.items() if k in Taco2AR.__dataclass_fields__},
    )
    variables = convert_torch_taco2ar(sd, model)
    # NOTE: deliberately jitted at the exact latent length (one compile per
    # distinct utterance length). Unlike the conv vocoder backends, this
    # downstream contains a BiLSTM — the backward pass reads the sequence
    # tail, so bucket-padding would perturb EVERY output frame, not just a
    # receptive-field margin. Parity with the s3prl-vc reference wins here;
    # the persistent compilation cache amortizes repeat lengths across runs.
    apply_fn = jax.jit(
        lambda latents, key: model.apply(
            variables, latents[None], rng=key, deterministic=True
        )[0]
    )

    def downstream(latents: np.ndarray) -> np.ndarray:
        mel = np.asarray(apply_fn(jnp.asarray(latents), jax.random.PRNGKey(0)))
        return mel * stats_scale + stats_mean  # denorm to the vocoder domain

    return downstream

"""Torch HiFi-GAN checkpoint -> flax parameter converter.

Enables loading reference-ecosystem vocoder checkpoints (jik876 HiFi-GAN /
bshall urhythmic generators, reference ``urhythmic/vocoder.py``) into the
JAX generator for parity evaluation (SURVEY.md §7 hard-part 5).

Weight-norm handling: torch checkpoints store (weight_g, weight_v) with
norms over dim 0; we materialize the effective weight and re-derive the
flax WeightNorm scale over flax's feature axis, which reproduces the same
effective kernel regardless of the differing norm axes.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _effective_weight(sd: Mapping[str, Any], prefix: str) -> np.ndarray:
    """Resolve weight-normed (or plain) torch weights to the effective kernel."""
    if f"{prefix}.weight_v" in sd:
        v = np.asarray(sd[f"{prefix}.weight_v"], np.float64)
        g = np.asarray(sd[f"{prefix}.weight_g"], np.float64)
        norm = np.linalg.norm(v.reshape(v.shape[0], -1), axis=1).reshape(
            (-1,) + (1,) * (v.ndim - 1)
        )
        return (v * (g / norm)).astype(np.float32)
    return np.asarray(sd[f"{prefix}.weight"], np.float32)


def _conv(sd, prefix):
    """torch Conv1d (out, in, k) -> flax (k, in, out) + bias."""
    w = _effective_weight(sd, prefix).transpose(2, 1, 0)
    b = np.asarray(sd[f"{prefix}.bias"], np.float32)
    return w, b


def _conv_transpose(sd, prefix):
    """torch ConvTranspose1d (in, out, k) -> flax (k, in, out) + bias.

    torch's transposed conv correlates with the kernel reversed relative to
    flax ConvTranspose, so the kernel tap axis is flipped.
    """
    w = _effective_weight(sd, prefix).transpose(2, 0, 1)[::-1].copy()
    b = np.asarray(sd[f"{prefix}.bias"], np.float32)
    return w, b


def _wn_scale(kernel: np.ndarray) -> np.ndarray:
    """flax WeightNorm scale: per-out-feature norm of the effective kernel."""
    return np.linalg.norm(kernel.reshape(-1, kernel.shape[-1]), axis=0).astype(
        np.float32
    )


def torch_hifigan_to_flax(
    state_dict: Mapping[str, Any],
    flax_params: Dict[str, Any],
    num_kernels: int = 3,
) -> Dict[str, Any]:
    """Map a jik876/urhythmic HifiganGenerator state dict into our flax tree.

    Args:
        state_dict: torch ``generator.state_dict()`` (possibly with
            'module.' prefixes, which are stripped).
        flax_params: template from ``HifiganGenerator.init`` (for structure).
        num_kernels: number of resblock kernel sizes.
    """
    sd = {k.removeprefix("module."): v for k, v in state_dict.items()}
    out = _tree_copy(flax_params)
    pp = out["params"]

    def assign(path_mod: str, kernel, bias, conv_name: str, wn_name: str):
        node = pp[path_mod]
        assert node[conv_name]["kernel"].shape == kernel.shape, (
            path_mod, node[conv_name]["kernel"].shape, kernel.shape,
        )
        node[conv_name]["kernel"] = kernel
        node[conv_name]["bias"] = bias
        node[wn_name][f"{conv_name}/kernel/scale"] = _wn_scale(kernel)

    # conv_pre / conv_post live at the generator's top level
    w, b = _conv(sd, "conv_pre")
    pp["conv_pre"]["kernel"] = w
    pp["conv_pre"]["bias"] = b
    pp["WeightNorm_0"]["conv_pre/kernel/scale"] = _wn_scale(w)

    n_ups = len([k for k in sd if k.startswith("ups.") and k.endswith(".bias")])
    for i in range(n_ups):
        w, b = _conv_transpose(sd, f"ups.{i}")
        assign(f"up_{i}", w, b, "ConvTranspose_0", "WeightNorm_0")
        for j in range(num_kernels):
            r = i * num_kernels + j
            # reference ResBlock stores convs1 (dilated) and convs2 (1x)
            n_dil = len(
                [k for k in sd if k.startswith(f"resblocks.{r}.convs1.") and k.endswith(".bias")]
            )
            for d in range(n_dil):
                w1, b1 = _conv(sd, f"resblocks.{r}.convs1.{d}")
                w2, b2 = _conv(sd, f"resblocks.{r}.convs2.{d}")
                assign(f"resblock_{i}_{j}", w1, b1, f"Conv_{2 * d}", f"WeightNorm_{2 * d}")
                assign(f"resblock_{i}_{j}", w2, b2, f"Conv_{2 * d + 1}", f"WeightNorm_{2 * d + 1}")

    w, b = _conv(sd, "conv_post")
    pp["conv_post"]["kernel"] = w
    pp["conv_post"]["bias"] = b
    pp["WeightNorm_1"]["conv_post/kernel/scale"] = _wn_scale(w)
    return out


def _tree_copy(tree):
    if isinstance(tree, dict):
        return {k: _tree_copy(v) for k, v in tree.items()}
    return np.asarray(tree)


def load_torch_hifigan(checkpoint_path: str, flax_params, key: str = "generator", num_kernels: int = 3):
    """Load a torch .pt/.pkl checkpoint and convert its generator weights."""
    import torch

    ckpt = torch.load(checkpoint_path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict):
        for k in (key, "model", "generator"):
            if k in ckpt:
                ckpt = ckpt[k]
                break
        if isinstance(ckpt, dict) and "model" in ckpt:
            ckpt = ckpt["model"]
    sd = {k: v.numpy() for k, v in ckpt.items()}
    return torch_hifigan_to_flax(sd, flax_params, num_kernels)

"""Convert a reference (torch) checkpoint into a native one.

The reference publishes pretrained VTN / AAS-VC / FastSpeechVC /
TransformerTTS checkpoints as ``torch.save`` dicts
(``{"model": state_dict, ...}``, reference ``trainers/base.py:85-105``).
This CLI maps one into this framework's msgpack checkpoint via the
name-based converters proven in ``tests/test_reference_parity.py``
(``seq2seq_vc_tpu/convert``), so ``vc_train --init-checkpoint`` /
``vc_decode`` consume reference-trained weights directly::

    python -m seq2seq_vc_tpu.bin.convert_checkpoint \
        --torch-checkpoint checkpoint-50000steps.pkl \
        --config exp/.../config.yml \
        --outpath exp/.../checkpoint-50000steps.ckpt

Models whose reference checkpoints carry BatchNorm running statistics need
``postnet_norm_type: batch_norm`` (and for conformers
``conformer_conv_norm_type: batch_norm``) in the model_params — the
converter errors with exactly that instruction otherwise.
"""

from __future__ import annotations

import argparse
import logging

from ..convert import (
    convert_aasvc,
    convert_fastspeech_vc,
    convert_transformer_tts,
    convert_vtn,
)
from ..core.checkpoint import save_checkpoint
from ..core.config import load_config
from ..models import get_model_class

_CONVERTERS = {
    "VTN": convert_vtn,
    "AASVC": convert_aasvc,
    "FastSpeechVC": convert_fastspeech_vc,
    "TransformerTTS": convert_transformer_tts,
}


def main():
    from ..core.cache import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--torch-checkpoint", required=True)
    parser.add_argument("--config", required=True,
                        help="reference exp config.yml (model_type/model_params)")
    parser.add_argument("--outpath", required=True)
    parser.add_argument("--verbose", type=int, default=1)
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO if args.verbose else logging.WARNING)

    import torch

    config = load_config(args.config)
    model_type = config["model_type"]
    if model_type not in _CONVERTERS:
        raise NotImplementedError(
            f"model_type {model_type!r}: converters exist for "
            f"{sorted(_CONVERTERS)}"
        )
    obj = torch.load(args.torch_checkpoint, map_location="cpu", weights_only=False)
    sd = obj["model"] if isinstance(obj, dict) and "model" in obj else obj
    steps = int(obj.get("steps", 0)) if isinstance(obj, dict) else 0
    epochs = int(obj.get("epochs", 0)) if isinstance(obj, dict) else 0

    model = get_model_class(model_type)(**config["model_params"])
    variables = _CONVERTERS[model_type](sd, model)
    n = sum(
        x.size for x in __import__("jax").tree_util.tree_leaves(variables)
    )
    logging.info(
        "converted %s: %.2fM params -> %s (steps=%d)",
        model_type, n / 1e6, args.outpath, steps,
    )
    save_checkpoint(args.outpath, variables, opt_state=(), steps=steps, epochs=epochs)


if __name__ == "__main__":
    main()

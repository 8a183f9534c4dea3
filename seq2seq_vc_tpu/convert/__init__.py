"""Torch-checkpoint converters for the reference seq2seq-vc models."""

from .reference import (  # noqa: F401
    convert_aasvc,
    convert_fastspeech_vc,
    convert_transformer_tts,
    convert_vtn,
)

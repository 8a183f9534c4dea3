"""Model registry (reference ``models/__init__.py:6-8``): the decode entry
point picks the AR vs NAR code path by registry membership
(``bin/vc_decode.py:222-226``)."""

from .vtn import VTN  # noqa: F401
from .transformer_tts import TransformerTTS  # noqa: F401
from .aas_vc import AASVC  # noqa: F401
from .fastspeech_vc import FastSpeechVC  # noqa: F401

AR_VC_MODELS = ["VTN"]
NAR_VC_MODELS = ["FastSpeechVC", "AASVC"]

_MODELS = {
    "VTN": VTN,
    "TransformerTTS": TransformerTTS,
    "AASVC": AASVC,
    "FastSpeechVC": FastSpeechVC,
}


def get_model_class(name: str):
    if name not in _MODELS:
        raise ValueError(f"unknown model_type: {name}")
    return _MODELS[name]

"""TPU-native sequence-to-sequence voice conversion framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``unilight/seq2seq-vc`` (see SURVEY.md): AR Voice Transformer Network (VTN),
non-autoregressive AAS-VC conformer with on-device monotonic alignment
search, FastSpeech-style NAR VC, Transformer-TTS pretraining, Urhythmic
rhythm conversion, feature extraction / normalization, neural vocoding, and
objective evaluation — designed TPU-first (SPMD meshes, functional
transforms, static shapes, Pallas kernels for the hot ops).
"""

__version__ = "0.1.0"

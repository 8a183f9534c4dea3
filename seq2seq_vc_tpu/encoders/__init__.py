"""Neural content/feature encoders (native flax ports of external models).

- ``encodec``: SEANet EnCodec-24kHz encoder (reference ``utils/encodec.py``
  wraps the external ``encodec`` package; here it is a native port + torch
  checkpoint converter).
- the HuBERT-soft encoder lives in ``seq2seq_vc_tpu.urhythmic.hubert``
  (its consumer is the urhythmic pipeline).
"""

from .encodec import EncodecEncoder, convert_torch_encodec, load_encodec  # noqa: F401

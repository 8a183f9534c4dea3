"""ASR-based intelligibility metrics (reference ``evaluate/asr.py``).

Transcription uses HuggingFace wav2vec2 CTC when the checkpoint is
available locally (no network egress in this image — pass a local model
dir); CER/WER are computed with a native Levenshtein (jiwer is not in this
image, same normalization: uppercase, strip punctuation).
"""

from __future__ import annotations

import re
from typing import List, Optional


def levenshtein(a: List, b: List) -> int:
    """Edit distance between two token sequences."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def normalize_text(text: str) -> str:
    text = text.upper()
    text = re.sub(r"[^A-Z' ]", "", text)
    return re.sub(r"\s+", " ", text).strip()


def character_error_rate(hyp: str, ref: str) -> float:
    hyp, ref = normalize_text(hyp).replace(" ", ""), normalize_text(ref).replace(" ", "")
    if not ref:
        return 0.0 if not hyp else 1.0
    return levenshtein(list(hyp), list(ref)) / len(ref)


def word_error_rate(hyp: str, ref: str) -> float:
    hyp_w, ref_w = normalize_text(hyp).split(), normalize_text(ref).split()
    if not ref_w:
        return 0.0 if not hyp_w else 1.0
    return levenshtein(hyp_w, ref_w) / len(ref_w)


class ASRTranscriber:
    """wav2vec2-CTC transcriber (reference uses torch
    facebook/wav2vec2-large-960h-lv60-self, ``evaluate/asr.py:6-15``).

    Prefers the FLAX model (runs on the TPU; torch checkpoints convert via
    ``from_pt=True``) and falls back to torch-cpu when the flax classes are
    unavailable. ``model``/``processor`` can be injected directly (tests,
    pre-loaded models).
    """

    def __init__(
        self,
        model_path: str = "facebook/wav2vec2-large-960h-lv60-self",
        device: str = "cpu",
        backend: str = "auto",  # 'flax' | 'torch' | 'auto'
        model=None,
        processor=None,
    ):
        self.device = device
        if processor is None:
            from transformers import Wav2Vec2Processor

            processor = Wav2Vec2Processor.from_pretrained(model_path)
        self.processor = processor
        if model is not None:
            self.model = model
            self.backend = (
                "flax" if model.__class__.__name__.startswith("Flax") else "torch"
            )
            return
        if backend in ("auto", "flax"):
            try:
                from transformers import FlaxWav2Vec2ForCTC

                try:
                    self.model = FlaxWav2Vec2ForCTC.from_pretrained(model_path)
                except (OSError, EnvironmentError):
                    # torch-only checkpoint dir: convert weights on load
                    self.model = FlaxWav2Vec2ForCTC.from_pretrained(
                        model_path, from_pt=True
                    )
                self.backend = "flax"
                return
            except Exception:
                if backend == "flax":
                    raise
        import torch  # noqa: F401
        from transformers import Wav2Vec2ForCTC

        self.model = Wav2Vec2ForCTC.from_pretrained(model_path).to(device).eval()
        self.backend = "torch"

    def _flax_logits(self, input_values):
        """Bucket-padded, attention-masked, jitted forward.

        - bucket padding (1 s quantum) bounds the compiled-shape set — an
          exact-length jit would recompile per utterance;
        - attention_mask keeps padded samples out of the transformer (the
          reference lv60 model is attention-mask-trained), and the CTC
          argmax is read only over the valid frame prefix;
        - params ride as a jit ARGUMENT (closure-captured weights would be
          re-embedded as constants in every compiled bucket).
        """
        import jax
        import numpy as np

        n = int(input_values.shape[-1])
        bucket = 16000
        nb = ((n + bucket - 1) // bucket) * bucket
        iv = np.pad(
            np.asarray(input_values, np.float32), ((0, 0), (0, nb - n))
        )
        am = np.zeros((1, nb), np.int32)
        am[:, :n] = 1
        if not hasattr(self, "_jit_fn") or self._jit_fn is None:
            self._jit_fn = jax.jit(
                lambda p, iv, am: self.model(
                    iv, attention_mask=am, params=p
                ).logits
            )
            # resident weights: transformers leaves params as host numpy,
            # which would re-upload ~300 MB over the tunnel per utterance
            self._device_params = jax.device_put(self.model.params)
        logits = np.asarray(self._jit_fn(self._device_params, iv, am))
        # valid output frames via the model's conv stack arithmetic
        nf = n
        for k, s in zip(self.model.config.conv_kernel, self.model.config.conv_stride):
            nf = (nf - k) // s + 1
        return logits[:, :nf]

    def transcribe(self, audio, sr: int = 16000) -> str:
        inputs = self.processor(
            audio, sampling_rate=sr, return_tensors="np", padding=True
        )
        if self.backend == "flax":
            import numpy as np

            ids = self._flax_logits(inputs.input_values).argmax(axis=-1)
        else:
            import torch

            with torch.no_grad():
                logits = self.model(
                    torch.from_numpy(inputs.input_values).to(self.device)
                ).logits
            ids = logits.argmax(dim=-1)
        return self.processor.batch_decode(ids)[0]

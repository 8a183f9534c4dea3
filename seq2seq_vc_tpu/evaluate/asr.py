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
    """wav2vec2-CTC transcriber (reference uses
    facebook/wav2vec2-large-960h-lv60-self)."""

    def __init__(self, model_path: str = "facebook/wav2vec2-large-960h-lv60-self", device: str = "cpu"):
        try:
            import torch  # noqa: F401
            from transformers import Wav2Vec2ForCTC, Wav2Vec2Processor
        except ImportError as e:  # pragma: no cover
            raise ImportError("transformers/torch required for ASR evaluation") from e
        self.processor = Wav2Vec2Processor.from_pretrained(model_path)
        self.model = Wav2Vec2ForCTC.from_pretrained(model_path).to(device).eval()
        self.device = device

    def transcribe(self, audio, sr: int = 16000) -> str:
        import torch

        inputs = self.processor(
            audio, sampling_rate=sr, return_tensors="pt", padding=True
        )
        with torch.no_grad():
            logits = self.model(inputs.input_values.to(self.device)).logits
        ids = logits.argmax(dim=-1)
        return self.processor.batch_decode(ids)[0]

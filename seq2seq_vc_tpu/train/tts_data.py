"""TTS dataset + collater (reference ``datasets/tts_dataset.py:51`` and
``collaters/ar_tts.py:178``): text file + cleaner + tokenizer +
TokenIDConverter -> (token_ids, mel)."""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np

from ..text import TextCleaner, TokenIDConverter, build_tokenizer
from .data import _make_loader, pad_batch


def read_2column_text(path: str) -> Dict[str, str]:
    data: Dict[str, str] = {}
    with open(path, encoding="utf-8") as f:
        for linenum, line in enumerate(f, 1):
            sps = line.rstrip().split(maxsplit=1)
            k, v = (sps[0], "") if len(sps) == 1 else sps
            if k in data:
                raise RuntimeError(f"{k} is duplicated ({path}:{linenum})")
            data[k] = v
    return data


class TTSDataset:
    def __init__(
        self,
        root_dir: str,
        text_path: str,
        non_linguistic_symbols,
        cleaner,
        g2p,
        token_list,
        token_type: str,
        feat_key: str = "mel",
        return_utt_id: bool = True,
        allow_cache: bool = False,
    ):
        self.text_cleaner = TextCleaner(cleaner)
        self.tokenizer = build_tokenizer(
            token_type=token_type,
            non_linguistic_symbols=non_linguistic_symbols,
            g2p_type=g2p,
        )
        self.token_id_converter = TokenIDConverter(token_list, unk_symbol="<unk>")
        self.mels = _make_loader(root_dir, feat_key)
        texts = read_2column_text(text_path)
        self.utt_ids = sorted(set(self.mels.keys()) & set(texts.keys()))
        assert self.utt_ids, "no utterances with both mel and text"
        self.texts = texts
        self._cache: Optional[Dict[int, Any]] = {} if allow_cache else None

    def __len__(self):
        return len(self.utt_ids)

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        if self._cache is not None and idx in self._cache:
            return self._cache[idx]
        utt = self.utt_ids[idx]
        text = self.text_cleaner(self.texts[utt])
        tokens = self.tokenizer.text2tokens(text)
        ids = np.asarray(self.token_id_converter.tokens2ids(tokens), np.int32)
        item = {
            "utt_id": utt,
            "text": ids,
            "trg_feat": np.asarray(self.mels[utt], np.float32),
        }
        if self._cache is not None:
            self._cache[idx] = item
        return item


class ARTTSCollater:
    """Pads token ids (+1 slot for the model's eos append) and mels."""

    def __init__(self, pad_multiple: int = 32, reduction_factor: int = 1):
        self.src_multiple = pad_multiple
        self.trg_multiple = int(np.lcm(pad_multiple, max(reduction_factor, 1)))

    def __call__(self, batch: List[Dict[str, Any]]) -> Dict[str, Any]:
        xs = [b["text"] for b in batch]
        ys = [b["trg_feat"] for b in batch]
        ilens = np.array([x.shape[0] for x in xs], np.int32)
        olens = np.array([y.shape[0] for y in ys], np.int32)
        xs = pad_batch(xs, self.src_multiple)
        ys = pad_batch(ys, self.trg_multiple)
        labels = np.zeros(ys.shape[:2], np.float32)
        for i, l in enumerate(olens):
            labels[i, l - 1 :] = 1.0
        return {
            "xs": xs,
            "ilens": ilens,
            "ys": ys,
            "olens": olens,
            "labels": labels,
            "utt_ids": [b["utt_id"] for b in batch],
        }

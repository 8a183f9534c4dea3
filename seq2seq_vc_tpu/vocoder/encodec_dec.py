"""EnCodec vocoder: converted continuous latents -> 24 kHz wav.

Working implementation of the surface the reference declares but cannot
run: ``bin/vc_train.py:40`` / ``bin/vc_decode.py:242-247`` import
``seq2seq_vc.vocoder.encodec.EnCodec_decoder`` from a module that does not
exist in the snapshot. Semantics per the call site: denormalize the
converted features with the VC target stats, then run the (native SEANet)
EnCodec decoder.
"""

from __future__ import annotations

import logging
import time
from typing import Any, Dict, Optional

import numpy as np

from ..dsp.stats import denormalize


class EnCodec_decoder:
    def __init__(self, trg_stats: Optional[Dict[str, np.ndarray]], checkpoint: str):
        """Args:
            trg_stats: {'mean','scale'} used to denormalize converted
                latents (reference ``vc_decode.py:242-247`` passes
                config['trg_stats']).
            checkpoint: torch EnCodec checkpoint (HF transformers or
                facebookresearch naming) converted into the flax decoder.
        """
        import jax

        import torch

        from ..encoders.encodec import EncodecDecoder, convert_torch_encodec_decoder

        obj = torch.load(checkpoint, map_location="cpu", weights_only=False)
        if hasattr(obj, "state_dict"):
            obj = obj.state_dict()
        if isinstance(obj, dict) and "state_dict" in obj:
            obj = obj["state_dict"]
        self.model = EncodecDecoder()
        # resident weights: no per-utt re-upload over the tunnel
        self.params = jax.device_put(convert_torch_encodec_decoder(obj))
        self.trg_stats = trg_stats
        self._apply = jax.jit(self.model.apply)

    @property
    def fs(self) -> int:
        return 24000

    def decode(self, latents: np.ndarray) -> np.ndarray:
        """latents: (T, 128) normalized converted features -> (T*320,) wav.

        The latent axis is zero-padded to a 64-frame bucket before the
        jitted forward: decode hands over exact per-utterance lengths, and
        a per-length jit would recompile the decoder for every utterance
        (minutes each over a remote-compile tunnel). The SEANet stack is
        CAUSAL (causal convs + forward LSTM), so the trimmed prefix matches
        an unpadded forward to float tolerance (shape-dependent XLA fusion
        reassociation only)."""
        start = time.time()
        if self.trg_stats is not None:
            latents = denormalize(
                latents, self.trg_stats["mean"], self.trg_stats["scale"]
            )
        t = latents.shape[0]
        tb = ((t + 63) // 64) * 64
        lp = np.pad(np.asarray(latents, np.float32), ((0, tb - t), (0, 0)))
        wav = np.asarray(self._apply(self.params, lp[None])[0])[: t * 320]
        rtf = (time.time() - start) / (len(wav) / self.fs)
        logging.info("encodec decode RTF = %.06f", rtf)
        return wav

"""Chunked AR-decode methods shared by the AR models (VTN, TransformerTTS).

The reference decodes autoregressively with a per-step python loop
(reference ``seq2seq_vc/models/vtn.py:302-394``,
``models/transformer_tts.py:204-265``); here the device runs ``lax.scan``
spans ("chunks") over a fixed-size KV cache, and the host only decides when
to stop — see ``models/ar_driver.ChunkedARDecoder`` for the geometric +
speculative host loop. Any model whose ``setup`` defines ``encode``,
``dprenet``/``dprenet_proj``, ``decoder`` (with ``init_cache``/
``precompute_memory``/``step``), ``feat_out``, ``prob_out`` and
``postnet`` gets the full chunked surface from this mixin:

- ``decode_init``  — encoder memory + projected cross-K/V + KV-cache state
- ``decode_chunk`` — ``chunk`` decode steps from ``t0`` (one compile/size)
- ``decode_postnet`` / ``decode_out_lens`` — final refinement + lengths
"""

from typing import Any, Dict

import jax
import jax.numpy as jnp


class ChunkedARDecodeMixin:
    def _decode_body(self, r, B, threshold, minlen_b, maxlen_b, mem_kv, h_masks):
        """Scan body shared by ``inference`` (one full-maxlen scan) and
        ``decode_chunk`` (host-chunked scan with early exit)."""

        def body(carry, t):
            y_prev, cache, finished, out_len, key = carry
            key, sub = jax.random.split(key)
            emb = self.dprenet_proj(self.dprenet(y_prev, rng=sub))
            z, cache, ca_w = self.decoder.step(emb, t, cache, mem_kv, h_masks)
            out_r = self.feat_out(z).reshape(B, r, self.odim)
            prob_r = jax.nn.sigmoid(self.prob_out(z))  # (B, r)

            stop_now = jnp.any(prob_r >= threshold, axis=-1)
            done_now = (stop_now & (t + 1 >= minlen_b)) | (t + 1 >= maxlen_b)
            newly = (~finished) & done_now
            out_len = jnp.where(newly, t + 1, out_len)
            finished = finished | done_now

            carry = (out_r[:, -1:, :], cache, finished, out_len, key)
            return carry, (out_r, prob_r, ca_w[:, :, :, 0, :])

        return body

    def decode_init(
        self, xs, ilens, rng, maxlenratio: float = 10.0, spembs=None,
        round_budget_to: int = 1,
    ) -> Dict[str, Any]:
        """Build the chunked-decode state: encoder memory, projected cross
        K/V, a full-maxlen KV cache, and per-item progress flags. The cache
        size (``state['cache']['k'].shape[3]``) is the static step budget;
        drive it with ``decode_chunk`` and stop early once
        ``state['finished']`` is all-True on the host — the TPU never runs
        the dead tail the single-scan ``inference`` pays for
        (maxlenratio 6-10 on short utterances is mostly dead steps).
        """
        r = self.decoder_reduction_factor
        B = xs.shape[0]
        hs, h_masks = self.encode(xs, ilens, spembs, deterministic=True)
        t_mem = hs.shape[1]
        hlens = h_masks.sum(-1) if h_masks is not None else jnp.full((B,), t_mem)
        maxlen = max(int(t_mem * maxlenratio / r), 1)
        # round the cache step budget up so the host driver can cover it with
        # chunk sizes from a fixed set (models/ar_driver.py); per-item stop
        # points (maxlen_b from true hlens) are unaffected
        rb = max(int(round_budget_to), 1)
        maxlen = -(-maxlen // rb) * rb
        return {
            "y_prev": jnp.zeros((B, 1, self.odim)),
            "cache": self.decoder.init_cache(B, maxlen),
            "mem_kv": self.decoder.precompute_memory(hs),
            "h_masks": h_masks,
            "hlens": hlens.astype(jnp.int32),
            "finished": jnp.zeros((B,), bool),
            "out_len": jnp.zeros((B,), jnp.int32),
            "rng": rng,
        }

    def decode_chunk(
        self,
        state: Dict[str, Any],
        t0,
        chunk: int,
        threshold: float = 0.5,
        minlenratio: float = 0.0,
        maxlenratio: float = 10.0,
    ):
        """Run ``chunk`` decode steps from step ``t0`` (traced scalar, so one
        compilation serves every chunk). Returns (new_state, outs (B, chunk*r,
        odim), probs (B, chunk*r), att (L, B, H, chunk, Tmem))."""
        r = self.decoder_reduction_factor
        B = state["y_prev"].shape[0]
        hlens = state["hlens"]
        maxlen_b = jnp.maximum((hlens * maxlenratio // r).astype(jnp.int32), 1)
        minlen_b = (hlens * minlenratio // r).astype(jnp.int32)
        body = self._decode_body(
            r, B, threshold, minlen_b, maxlen_b, state["mem_kv"], state["h_masks"]
        )
        init = (
            state["y_prev"], state["cache"], state["finished"],
            state["out_len"], state["rng"],
        )
        (y_prev, cache, finished, out_len, key), (outs, probs, att) = jax.lax.scan(
            body, init, t0 + jnp.arange(chunk)
        )
        new_state = dict(
            state, y_prev=y_prev, cache=cache, finished=finished,
            out_len=out_len, rng=key,
        )
        outs = outs.transpose(1, 0, 2, 3).reshape(B, chunk * r, self.odim)
        probs = probs.transpose(1, 0, 2).reshape(B, chunk * r)
        att = att.transpose(1, 2, 3, 0, 4)
        return new_state, outs, probs, att

    def decode_postnet(self, outs, out_lens=None):
        """Postnet refinement over the host-assembled frame sequence.

        ``out_lens`` (B,) valid frame counts: frames past an item's stop
        point are DEAD (the scan keeps generating after ``finished``), and
        the postnet convs would smear them into the last valid frames
        within the kernel's receptive field. The reference applies its
        postnet to exactly the generated frames (reference
        ``vtn.py:382-388``), i.e. with zero conv padding beyond the stop —
        masking the dead tail to zero before the convs reproduces that
        exactly (measured: an unmasked tail costs ~0.5 dB cross-framework
        MCD on decoded waveforms; scripts/e2e_parity.py round 5)."""
        if self.postnet is None:
            return outs
        if out_lens is None:
            return outs + self.postnet(outs, deterministic=True)
        valid = jnp.arange(outs.shape[1])[None, :] < out_lens[:, None]
        outs = jnp.where(valid[..., None], outs, 0.0)
        return outs + self.postnet(outs, deterministic=True, mask=valid)

    def decode_out_lens(self, state: Dict[str, Any], maxlenratio: float):
        """Final per-item output step counts (in frames, i.e. *r)."""
        r = self.decoder_reduction_factor
        maxlen_b = jnp.maximum(
            (state["hlens"] * maxlenratio // r).astype(jnp.int32), 1
        )
        out_len = jnp.where(state["finished"], state["out_len"], maxlen_b)
        return out_len * r

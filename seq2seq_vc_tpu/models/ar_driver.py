"""Host-side driver for chunked AR decode: geometric chunk growth +
speculative dispatch.

``decode_init``/``decode_chunk`` (models/vtn.py) already replace the
reference's per-step python loop (reference ``seq2seq_vc/models/vtn.py:302-394``)
with device-side scans, but the host loop still pays one dispatch and one
blocking ``finished`` fetch per chunk over the remote-TPU tunnel — AR decode
is dispatch-latency bound, not compute bound (CLAUDE.md round-3 bench notes).
Two exact (semantics-preserving) latency levers:

- **geometric schedule**: chunk sizes double from ``base_chunk`` up to
  ``max_chunk``; every size is a power-of-two multiple of ``base_chunk``, so
  at most ``log2(max_chunk/base_chunk)+1`` distinct compilations exist (all
  served by the persistent XLA compilation cache across processes). A decode
  that used ``T/base`` host round trips now makes ``O(log T)``.
- **speculative dispatch**: chunk ``i+1`` is enqueued BEFORE chunk ``i``'s
  ``finished`` flags are fetched, so the fetch's tunnel round trip overlaps
  device compute. A chunk speculated past the stop point only produces dead
  frames — ``finished`` items hold ``out_len`` fixed inside the scan body —
  and its outputs are dropped here, so results are identical to the
  sequential loop (and to single-scan ``inference``) frame-for-frame.

The decode budget (KV-cache step capacity) is rounded up to a multiple of
``base_chunk`` by ``decode_init(round_budget_to=...)`` so every remaining
span is schedulable from the fixed size set; per-item semantic stop points
(``maxlen_b`` from the true hlens) are unchanged.
"""

from typing import Any, Dict

import jax
import numpy as np


def chunk_schedule(maxlen: int, base: int, max_chunk: int, first: int = 0):
    """Chunk sizes covering ``maxlen`` steps: doubling from ``base``, capped
    at ``max_chunk``, shrunk to the largest power-of-two multiple of ``base``
    that fits the remainder. ``maxlen`` must be a multiple of ``base``.

    ``first`` > 0 requests an expected-length first chunk: the opening
    dispatch is the smallest power-of-two multiple of ``base`` >= ``first``
    (clamped to the budget), so a decode whose stop point the caller can
    estimate (VC: output length tracks input length) usually completes in
    one or two round trips; the tail continues doubling from ``base``."""
    assert maxlen % base == 0 and maxlen > 0, (maxlen, base)
    sizes = []
    cur = base
    t0 = 0
    if first > 0:
        f = base
        while f < first and f < maxlen:
            f *= 2
        # round down to what fits the budget
        while f > maxlen:
            f //= 2
        sizes.append(f)
        t0 = f
    while t0 < maxlen:
        s = min(cur, max_chunk, maxlen - t0)
        # round down to a power-of-two multiple of base so the jit cache
        # stays small (remaining is always a multiple of base)
        p2 = base
        while p2 * 2 <= s:
            p2 *= 2
        sizes.append(p2)
        t0 += p2
        cur = min(cur * 2, max_chunk)
    return sizes


class ChunkedARDecoder:
    """Drives a model's ``decode_init``/``decode_chunk``/``decode_postnet``/
    ``decode_out_lens`` methods (VTN-style chunked AR decode) with the
    geometric + speculative host loop. Returns the same dict contract as the
    model's single-scan ``inference``: outs / probs / att_ws / out_lens."""

    def __init__(
        self,
        model,
        model_class,
        threshold: float = 0.5,
        minlenratio: float = 0.0,
        maxlenratio: float = 6.0,
        base_chunk: int = 32,
        max_chunk: int = 256,
        speculate: bool = True,
    ):
        self.model = model
        self.cls = model_class
        self.thr = float(threshold)
        self.minr = float(minlenratio)
        self.maxr = float(maxlenratio)
        self.base = int(base_chunk)
        self.max_chunk = max(int(max_chunk), self.base)
        self.speculate = speculate
        self._init_fn = jax.jit(
            lambda p, xs, ilens, key: model.apply(
                p, xs, ilens, key, self.maxr,
                round_budget_to=self.base,
                method=model_class.decode_init,
            )
        )
        self._chunk_fns: Dict[int, Any] = {}
        self._post_fns: Dict[int, Any] = {}
        self._lens_fn = jax.jit(
            lambda p, st: model.apply(
                p, st, self.maxr, method=model_class.decode_out_lens
            )
        )

    def _chunk_fn(self, size: int):
        fn = self._chunk_fns.get(size)
        if fn is None:
            fn = jax.jit(
                lambda p, st, t0: self.model.apply(
                    p, st, t0, size, self.thr, self.minr, self.maxr,
                    method=self.cls.decode_chunk,
                )
            )
            self._chunk_fns[size] = fn
        return fn

    def _postnet(self, sizes_key):
        """Concat-the-chunks + postnet as ONE jitted dispatch, keyed by the
        tuple of chunk frame-lengths (few distinct tuples: schedule
        prefixes). The final state rides along so the per-item valid
        lengths can mask the dead tail (frames generated past each item's
        stop) to zero before the postnet convs — exactly the zero padding
        the reference's exact-length postnet sees."""
        fn = self._post_fns.get(sizes_key)
        if fn is None:
            import jax.numpy as jnp

            def post(p, st, *outs_c):
                o = outs_c[0] if len(outs_c) == 1 else jnp.concatenate(
                    outs_c, axis=1
                )
                lens = self.model.apply(
                    p, st, self.maxr, method=self.cls.decode_out_lens
                )
                return self.model.apply(
                    p, o, lens, method=self.cls.decode_postnet
                )

            fn = jax.jit(post)
            self._post_fns[sizes_key] = fn
        return fn

    def __call__(
        self, params, xs, ilens, key, est_steps: int = 0, on_chunk=None
    ) -> Dict[str, Any]:
        """``est_steps`` > 0: expected decode step count (host heuristic,
        e.g. ``ceil(ratio * max(ilens) / r)`` for VC where output length
        tracks input length) — sizes the first dispatch to cover it.

        ``on_chunk(chunk_idx, outs_list, state)`` is invoked right after
        each chunk DISPATCH, before the blocking finished-flag fetch — a
        hook for speculative downstream dispatch (the wav2wav pipeline
        enqueues postnet+vocoder synthesis of the decoded prefix here, so
        it computes while the host waits on the fetch round trip;
        ``pipeline.Wav2WavARConverter``). The callback must only enqueue
        async device work — a host sync inside it serializes the loop.
        """
        import jax.numpy as jnp

        st = self._init_fn(params, xs, ilens, key)
        maxlen = int(st["cache"]["k"].shape[3])
        sizes = chunk_schedule(maxlen, self.base, self.max_chunk, est_steps)

        outs_c, probs_c, att_c = [], [], []
        prev_finished = None  # flags BEFORE the most recently dispatched chunk
        t0 = 0
        for si, s in enumerate(sizes):
            st, outs, probs, att = self._chunk_fn(s)(params, st, t0)
            outs_c.append(outs)
            probs_c.append(probs)
            att_c.append(att)
            t0 += s
            if on_chunk is not None:
                on_chunk(si, list(outs_c), st)
            if self.speculate:
                # fetch the flags from BEFORE this chunk; the blocking round
                # trip overlaps this chunk's device compute. If everything had
                # already finished, this chunk was pure dead work — drop it.
                if prev_finished is not None and bool(
                    np.asarray(prev_finished).all()
                ):
                    outs_c.pop(), probs_c.pop(), att_c.pop()
                    break
                prev_finished = st["finished"]
            else:
                if bool(np.asarray(st["finished"]).all()):
                    break

        sizes_key = tuple(o.shape[1] for o in outs_c)
        return {
            "outs": self._postnet(sizes_key)(params, st, *outs_c),
            "probs": probs_c[0] if len(probs_c) == 1
            else jnp.concatenate(probs_c, axis=1),
            "att_ws": att_c[0] if len(att_c) == 1
            else jnp.concatenate(att_c, axis=3),
            "out_lens": self._lens_fn(params, st),
            # number of KEPT chunks: an on_chunk pipeline dispatched at this
            # index is the exact final sequence (dropped dead chunks excluded)
            "n_chunks_kept": len(outs_c),
        }

    @property
    def n_compiles(self) -> int:
        return len(self._chunk_fns)

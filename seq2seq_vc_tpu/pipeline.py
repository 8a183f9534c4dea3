"""Single-jit wav-in / wav-out conversion pipeline.

The north-star deployment path (BASELINE.md): one compiled TPU program per
length bucket runs log-mel analysis -> normalization -> AAS-VC conversion
-> denorm/renorm -> HiFi-GAN synthesis, so a conversion request costs one
host->device round trip. The reference instead chains five processes
(preprocess / normalize / vc_decode / vocoder) through files.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .dsp.features import _logmel
from .dsp.mel import mel_filterbank
from .dsp.stft import hann_window, num_frames
from .models import AASVC
from .vocoder.hifigan import HifiganGenerator


def _geom_bucket(n_frames: int, cap: int, base: int) -> int:
    """Geometric synthesis-length bucket: smallest ``base * 2^k`` >=
    ``n_frames``, capped at ``cap`` (the feats budget).

    Output lengths vary per request (stochastic duration predictors, AR
    stop decisions), and every NEW synthesis length is a fresh vocoder
    jit compile — ~30-50 s over the axon remote-compile tunnel, which
    DOMINATED serve latency with linear ``bucket_frames`` multiples
    (measured r5: vc_serve p50 31 s/request at concurrency 1 — nearly
    every request compiled). A power-of-two ladder bounds the program
    count to ~log2(max_out/base) (+the cap itself), so ``warmup_synth``
    can precompile all of it; the <2x chunked-vocoder overshoot costs
    ~RTF 0.006 of extra compute, three orders of magnitude below one
    compile."""
    b = base
    while b < min(n_frames, cap):
        b *= 2
    return min(b, cap)


def _synth_ladder(cap: int, base: int):
    """All bucket lengths ``_geom_bucket`` can produce for a given cap."""
    out = []
    b = base
    while b < cap:
        out.append(b)
        b *= 2
    out.append(cap)
    return out


class Wav2WavConverter:
    """End-to-end NAR VC + HiFi-GAN converter, fully on device.

    Works with any NAR model whose ``inference`` takes
    ``(xs, ilens, dp_inputs, ..., max_output_frames=...)`` and returns
    ``outs``/``out_lens`` — AASVC and FastSpeechVC both qualify."""

    def __init__(
        self,
        model: AASVC,
        model_params: Any,
        vocoder: HifiganGenerator,
        vocoder_params: Any,
        src_stats: Dict[str, np.ndarray],
        trg_stats: Dict[str, np.ndarray],
        config: Dict[str, Any],
        vocoder_stats: Optional[Dict[str, np.ndarray]] = None,
        bucket_frames: int = 128,
    ):
        self.model = model
        # params live ON DEVICE, passed as jit arguments each call (never
        # closed over — the axon hang class). Leaving them as host numpy
        # re-uploads the whole weight set over the tunnel EVERY request:
        # measured r5, this made each serve request 15-30 s (the CLAUDE.md
        # "device_put before a timed loop" rule, bitten at serving scale).
        self.model_params = jax.device_put(model_params)
        self.vocoder = vocoder
        self.vocoder_params = jax.device_put(vocoder_params)
        self.config = config
        self.bucket_frames = bucket_frames
        self.fft_size = config.get("fft_size", 1024)
        self.hop_size = config.get("hop_size", 256)
        sr = config.get("sampling_rate", 16000)
        self.sr = sr

        # analysis constants stay HOST numpy: closures over DEVICE arrays in
        # jitted functions are the documented axon hang class (CLAUDE.md
        # rule 2); numpy constants embed from host memory at trace time
        self._window = np.asarray(
            hann_window(config.get("win_length") or self.fft_size, self.fft_size)
        )
        self._mel_t = np.asarray(
            mel_filterbank(
                sr, self.fft_size, config.get("num_mels", 80),
                config.get("fmin") or 0, config.get("fmax") or sr / 2,
            ).T
        )
        self._src_mean = np.asarray(src_stats["mean"], np.float32)
        self._src_scale = np.asarray(src_stats["scale"], np.float32)
        self._trg_mean = np.asarray(trg_stats["mean"], np.float32)
        self._trg_scale = np.asarray(trg_stats["scale"], np.float32)
        if vocoder_stats is not None:
            self._voc_mean = np.asarray(vocoder_stats["mean"], np.float32)
            self._voc_scale = np.asarray(vocoder_stats["scale"], np.float32)
        else:
            self._voc_mean = self._trg_mean
            self._voc_scale = self._trg_scale

        self._jit_cache: Dict[Any, Any] = {}

    def _get_fn(self, n_frames_padded: int, max_out: int):
        key = (n_frames_padded, max_out)
        if key in self._jit_cache:
            return self._jit_cache[key]
        model = self.model
        hop, fft = self.hop_size, self.fft_size

        @partial(jax.jit, static_argnames=())
        def convert(mp, x_padded, n_frames, rng):
            # 1. log-mel analysis (x_padded is host reflect-padded audio);
            # same jitted chain as preprocessing (dsp/features._logmel)
            mel = _logmel(x_padded, self._window, self._mel_t, fft, hop, 10.0)
            # 2. normalize by source stats
            mel = (mel - self._src_mean) / self._src_scale
            # 3. convert
            out = model.apply(
                mp, mel[None], jnp.asarray([n_frames]),
                mel[None],  # dp_input = source mel (melmelmel config)
                max_output_frames=max_out,
                method=type(model).inference, rngs={"noise": rng},
            )
            feats = out["outs"][0]
            # 4. denorm by target stats, renorm by vocoder stats
            feats = feats * self._trg_scale + self._trg_mean
            feats = (feats - self._voc_mean) / self._voc_scale
            return feats, out["out_lens"][0]

        self._jit_cache[key] = convert
        return convert

    def _get_synth_fn(self, n_frames: int):
        """Chunked HiFi-GAN synthesis (one jit; retraces per mel length)."""
        del n_frames  # jax.jit already caches per input shape
        if "synth" in self._jit_cache:
            return self._jit_cache["synth"]
        vocoder = self.vocoder

        @jax.jit
        def synth(vp, feats):
            # overlap-halo chunking: batched chunks keep the low-channel
            # conv stages on the MXU (single-stream is ~10x less efficient)
            from .vocoder.hifigan import chunked_generate

            return chunked_generate(vocoder, vp, feats)

        self._jit_cache["synth"] = synth
        return synth

    def __call__(self, audio: np.ndarray, rng=None) -> np.ndarray:
        """audio (T,) float32 in [-1,1] -> converted waveform (T',)."""
        audio = np.asarray(audio, np.float32)
        n_true = num_frames(len(audio), self.hop_size)
        pad = self.fft_size // 2
        x = np.pad(audio, (pad, pad), mode="reflect")
        # padded length divisible by the bucket quantum and the model's
        # reduction factors; decode budget 2x the input (in reduced decoder
        # frames) covers any plausible rhythm ratio — see _frame_geometry
        n_padded, target_len, max_out = self._frame_geometry([len(x)])
        x = np.pad(x, (0, max(0, target_len - len(x))))[:target_len]

        fn = self._get_fn(n_padded, max_out)
        if rng is None:
            rng = jax.random.PRNGKey(0)
        feats, out_len = fn(
            self.model_params, jnp.asarray(x), jnp.asarray(n_true, jnp.int32),
            rng,
        )
        # AASVC.inference already returns out_lens in full (un-reduced)
        # decoder frames (out_lens_red * decoder_reduction_factor). One
        # tiny host fetch here lets the synthesis stage run on a length
        # bucket near the TRUE output length instead of the worst-case
        # decode budget (2x input) — vocoder work tracks actual audio.
        self.last_out_frames = max(1, int(out_len))
        self.last_synth_cap = int(feats.shape[0])
        n_bucket = _geom_bucket(
            self.last_out_frames, feats.shape[0], self.bucket_frames
        )
        synth = self._get_synth_fn(n_bucket)
        wav = synth(self.vocoder_params, feats[:n_bucket])
        n_samples = min(self.last_out_frames * self.hop_size, wav.shape[0])
        return np.asarray(wav[:n_samples])

    # ------------------------------------------------------------- batched
    def _frame_geometry(self, padded_lens):
        """Shared bucket geometry for a set of reflect-padded lengths."""
        pr = getattr(self.model, "post_encoder_reduction_factor", 1)
        er = getattr(self.model, "encoder_reduction_factor", 1)
        dr = getattr(self.model, "decoder_reduction_factor", 1)
        m = int(
            np.lcm(np.lcm(self.bucket_frames, max(pr, 1) * max(er, 1)), max(dr, 1))
        )
        n_raw = max(1 + (L - self.fft_size) // self.hop_size for L in padded_lens)
        n_padded = ((n_raw + m - 1) // m) * m
        target_len = self.fft_size + (n_padded - 1) * self.hop_size
        max_out = (2 * n_padded) // max(dr, 1) + 8
        return n_padded, target_len, max_out

    def _get_batch_fn(self, batch: int, n_frames_padded: int, max_out: int):
        key = ("batch", batch, n_frames_padded, max_out)
        if key in self._jit_cache:
            return self._jit_cache[key]
        model = self.model
        hop, fft = self.hop_size, self.fft_size

        @jax.jit
        def convert(mp, x_padded, n_frames, rng):
            mel = jax.vmap(
                lambda x: _logmel(x, self._window, self._mel_t, fft, hop, 10.0)
            )(x_padded)
            mel = (mel - self._src_mean) / self._src_scale
            out = model.apply(
                mp, mel, n_frames, mel,
                max_output_frames=max_out,
                method=type(model).inference, rngs={"noise": rng},
            )
            feats = out["outs"]
            feats = feats * self._trg_scale + self._trg_mean
            feats = (feats - self._voc_mean) / self._voc_scale
            return feats, out["out_lens"]

        self._jit_cache[key] = convert
        return convert

    def convert_batch(self, audios, rng=None):
        """Convert several waveforms in ONE batched model call.

        All items pad to the longest item's bucket, so the NAR conversion
        runs at the MXU-efficient (B, T) shape (one dispatch for the whole
        batch instead of B); each item then synthesizes through the shared
        per-bucket vocoder jit. Returns a list of waveforms in input order.
        """
        audios = [np.asarray(a, np.float32) for a in audios]
        if not audios:
            return []
        pad = self.fft_size // 2
        xs = [np.pad(a, (pad, pad), mode="reflect") for a in audios]
        n_trues = [num_frames(len(a), self.hop_size) for a in audios]
        n_padded, target_len, max_out = self._frame_geometry([len(x) for x in xs])

        B = len(xs)
        batch = np.zeros((B, target_len), np.float32)
        for i, x in enumerate(xs):
            n = min(len(x), target_len)
            batch[i, :n] = x[:n]

        fn = self._get_batch_fn(B, n_padded, max_out)
        if rng is None:
            rng = jax.random.PRNGKey(0)
        feats, out_lens = fn(
            self.model_params, jnp.asarray(batch),
            jnp.asarray(n_trues, jnp.int32), rng,
        )
        out_lens = np.asarray(out_lens)

        wavs = []
        self.last_synth_cap = int(feats.shape[1])
        for i in range(B):
            n_frames_i = max(1, int(out_lens[i]))
            n_bucket = _geom_bucket(
                n_frames_i, feats.shape[1], self.bucket_frames
            )
            synth = self._get_synth_fn(n_bucket)
            wav = synth(self.vocoder_params, feats[i, :n_bucket])
            n_samples = min(n_frames_i * self.hop_size, wav.shape[0])
            wavs.append(np.asarray(wav[:n_samples]))
        return wavs

    def warmup_synth(self) -> int:
        """Precompile the whole ``_geom_bucket`` synthesis ladder for the
        most recent conversion's feats budget (call right after a warmup
        conversion). A cold synthesis length costs a ~30-50 s remote
        compile on axon; after this, no request whose input fits the
        warmed analysis bucket ever retraces synthesis. Returns the
        number of ladder buckets compiled."""
        cap = int(getattr(self, "last_synth_cap", 0) or 0)
        if cap <= 0:
            return 0
        d = int(getattr(self.model, "odim", self._trg_mean.shape[-1]))
        n = 0
        for b in _synth_ladder(cap, self.bucket_frames):
            synth = self._get_synth_fn(b)
            np.asarray(
                synth(self.vocoder_params, jnp.zeros((b, d), jnp.float32))
            )
            n += 1
        return n


class Wav2WavARConverter:
    """Wav->wav conversion through an AR model (VTN): per-bucket jitted
    log-mel analysis, chunked AR decode via ``models/ar_driver.
    ChunkedARDecoder`` (geometric chunk growth + speculative dispatch +
    expected-length first chunk), stat chain, chunked HiFi-GAN synthesis.

    Same serving surface as ``Wav2WavConverter`` (``__call__`` and
    ``convert_batch``), so ``bin/vc_serve.py`` can host AR checkpoints too —
    the reference has no serving path for either model family.
    """

    def __init__(
        self,
        model,
        model_params: Any,
        vocoder: HifiganGenerator,
        vocoder_params: Any,
        src_stats: Dict[str, np.ndarray],
        trg_stats: Dict[str, np.ndarray],
        config: Dict[str, Any],
        vocoder_stats: Optional[Dict[str, np.ndarray]] = None,
        bucket_frames: int = 64,
    ):
        from .models.ar_driver import ChunkedARDecoder

        self.model = model
        # on-device once; see Wav2WavConverter.__init__ (host-numpy params
        # cost a full weight re-upload per request over the tunnel)
        self.model_params = jax.device_put(model_params)
        self.vocoder = vocoder
        self.vocoder_params = jax.device_put(vocoder_params)
        self.config = config
        self.bucket_frames = bucket_frames
        self.fft_size = config.get("fft_size", 1024)
        self.hop_size = config.get("hop_size", 256)
        self.sr = config.get("sampling_rate", 16000)

        self._window = np.asarray(
            hann_window(config.get("win_length") or self.fft_size, self.fft_size)
        )
        self._mel_t = np.asarray(
            mel_filterbank(
                self.sr, self.fft_size, config.get("num_mels", 80),
                config.get("fmin") or 0, config.get("fmax") or self.sr / 2,
            ).T
        )
        self._src_mean = np.asarray(src_stats["mean"], np.float32)
        self._src_scale = np.asarray(src_stats["scale"], np.float32)
        self._trg_mean = np.asarray(trg_stats["mean"], np.float32)
        self._trg_scale = np.asarray(trg_stats["scale"], np.float32)
        if vocoder_stats is not None:
            self._voc_mean = np.asarray(vocoder_stats["mean"], np.float32)
            self._voc_scale = np.asarray(vocoder_stats["scale"], np.float32)
        else:
            self._voc_mean = self._trg_mean
            self._voc_scale = self._trg_scale

        inf = config.get("inference", {}) or {}
        self._est_ratio = float(inf.get("decode_est_len_ratio", 1.2))
        self._r = int(
            config.get("model_params", {}).get("decoder_reduction_factor", 1)
            if isinstance(config.get("model_params"), dict)
            else getattr(model, "decoder_reduction_factor", 1)
        )
        self.driver = ChunkedARDecoder(
            model, type(model),
            threshold=inf.get("threshold", 0.5),
            minlenratio=inf.get("minlenratio", 0.0),
            maxlenratio=inf.get("maxlenratio", 6.0),
            base_chunk=int(inf.get("decode_chunk_steps", 32)),
            max_chunk=int(inf.get("decode_max_chunk_steps", 256)),
        )
        self._jit_cache: Dict[Any, Any] = {}

    def _analysis_fn(self, n_padded: int, batch: int):
        key = ("mel", n_padded, batch)
        if key in self._jit_cache:
            return self._jit_cache[key]
        hop, fft = self.hop_size, self.fft_size

        @jax.jit
        def analyze(x_padded):
            one = lambda x: (
                _logmel(x, self._window, self._mel_t, fft, hop, 10.0)
                - self._src_mean
            ) / self._src_scale
            return jax.vmap(one)(x_padded) if x_padded.ndim == 2 else one(x_padded)

        self._jit_cache[key] = analyze
        return analyze

    def _synth_fn(self):
        if "synth" in self._jit_cache:
            return self._jit_cache["synth"]
        vocoder = self.vocoder

        @jax.jit
        def synth(vp, feats):
            from .vocoder.hifigan import chunked_generate

            return chunked_generate(vocoder, vp, feats)

        self._jit_cache["synth"] = synth
        return synth

    def _stream_fn(self, sizes_key):
        """One jitted postnet -> stat chain -> batched chunked HiFi-GAN
        pipeline over the concatenated decode chunks, keyed by the tuple of
        chunk frame-lengths (few distinct tuples: schedule prefixes).

        Dispatched speculatively from the decode loop's ``on_chunk`` hook:
        the synthesis computes on-device while the host blocks on the
        chunk's finished-flag fetch, so when the decode stops (usually after
        the expected-length first chunk) the waveform is already in flight —
        the serial path's postnet+vocoder tail drops out of the latency.
        A speculation that undershoots (decode continued) is dead work on a
        device that would otherwise idle through the fetch round trip.
        """
        key = ("stream",) + sizes_key
        if key in self._jit_cache:
            return self._jit_cache[key]
        import jax.numpy as jnp

        from .vocoder.hifigan import chunked_generate

        model, cls, vocoder = self.model, type(self.model), self.vocoder
        maxr = self.driver.maxr

        @jax.jit
        def pipe(mp, vp, st, *outs_c):
            o = outs_c[0] if len(outs_c) == 1 else jnp.concatenate(
                outs_c, axis=1
            )
            # per-item valid lengths from the decode state (device-side, no
            # host sync): the postnet masks the dead tail to zero — same
            # reference-parity masking as the serial driver path, so the
            # winning speculation stays bit-identical to it
            lens = model.apply(mp, st, maxr, method=cls.decode_out_lens)
            after = model.apply(mp, o, lens, method=cls.decode_postnet)
            feats = after * self._trg_scale + self._trg_mean
            feats = (feats - self._voc_mean) / self._voc_scale
            return jax.vmap(lambda m: chunked_generate(vocoder, vp, m))(feats)

        self._jit_cache[key] = pipe
        return pipe

    def _prepare(self, audios):
        pad = self.fft_size // 2
        xs = [np.pad(np.asarray(a, np.float32), (pad, pad), mode="reflect")
              for a in audios]
        n_trues = [num_frames(len(a), self.hop_size) for a in audios]
        n_raw = max(1 + (len(x) - self.fft_size) // self.hop_size for x in xs)
        m = int(np.lcm(self.bucket_frames, max(self._r, 1)))
        n_padded = ((n_raw + m - 1) // m) * m
        target_len = self.fft_size + (n_padded - 1) * self.hop_size
        batch = np.zeros((len(xs), target_len), np.float32)
        for i, x in enumerate(xs):
            n = min(len(x), target_len)
            batch[i, :n] = x[:n]
        return batch, np.asarray(n_trues, np.int32), n_padded

    def convert_batch(self, audios, rng=None, stream_vocoder=None):
        """Batched AR conversion: one chunked decode drives the whole
        (B, T) batch (per-item early stop handled by the driver's budget
        masks); per-item synthesis on length buckets.

        ``stream_vocoder`` (default: the config's
        ``inference.stream_vocoder``, else True): overlap vocoder synthesis
        with the chunked decode by speculatively dispatching the full
        postnet+stats+synthesis pipeline for the decoded prefix after every
        chunk dispatch (``_stream_fn``). The speculation that matches the
        final kept-chunk set IS the final result — identical math to the
        serial path dispatched earlier — so outputs match the serial path
        (chunked_generate's documented halo tolerance applies only past
        each item's valid length, where the serial per-item bucket trim
        sees edge padding but the streamed full-length batch sees real
        neighbor frames)."""
        audios = [np.asarray(a, np.float32) for a in audios]
        if not audios:
            return []
        if rng is None:
            rng = jax.random.PRNGKey(0)
        if stream_vocoder is None:
            stream_vocoder = bool(
                (self.config.get("inference", {}) or {}).get(
                    "stream_vocoder", True
                )
            )
        batch, n_trues, n_padded = self._prepare(audios)
        mel = self._analysis_fn(n_padded, len(audios))(jnp.asarray(batch))
        est = int(np.ceil(self._est_ratio * int(n_trues.max()) / self._r))

        spec: Dict[int, Any] = {}

        def on_chunk(si, outs_list, st):
            fn = self._stream_fn(tuple(o.shape[1] for o in outs_list))
            spec[len(outs_list)] = fn(
                self.model_params, self.vocoder_params, st, *outs_list
            )

        out = self.driver(
            self.model_params, mel, jnp.asarray(n_trues), rng, est_steps=est,
            on_chunk=on_chunk if stream_vocoder else None,
        )
        out_lens = np.asarray(out["out_lens"])

        wav_b = spec.get(out.get("n_chunks_kept"))
        if wav_b is not None:
            # the speculative pipeline for the kept chunk set already holds
            # the final waveforms (dispatched chunks ago) — just trim
            return [
                np.asarray(
                    wav_b[i, : max(1, int(out_lens[i])) * self.hop_size]
                )
                for i in range(len(audios))
            ]

        feats_all = out["outs"] * self._trg_scale + self._trg_mean
        feats_all = (feats_all - self._voc_mean) / self._voc_scale

        synth = self._synth_fn()
        # dispatch every item's synthesis before fetching any: the fetch of
        # item i then overlaps item i+1's device compute
        pending = []
        self.last_synth_cap = int(feats_all.shape[1])
        for i in range(len(audios)):
            n_frames_i = max(1, int(out_lens[i]))
            n_bucket = _geom_bucket(
                n_frames_i, feats_all.shape[1], self.bucket_frames
            )
            wav = synth(self.vocoder_params, feats_all[i, :n_bucket])
            pending.append((wav, n_frames_i))
        return [
            np.asarray(wav[: min(n_frames_i * self.hop_size, wav.shape[0])])
            for wav, n_frames_i in pending
        ]

    def warmup_synth(self) -> int:
        """AR twin of ``Wav2WavConverter.warmup_synth`` (same ladder, same
        per-shape-cached chunked HiFi-GAN jit)."""
        cap = int(getattr(self, "last_synth_cap", 0) or 0)
        if cap <= 0:
            return 0
        d = int(getattr(self.model, "odim", self._trg_mean.shape[-1]))
        synth = self._synth_fn()
        n = 0
        for b in _synth_ladder(cap, self.bucket_frames):
            np.asarray(
                synth(self.vocoder_params, jnp.zeros((b, d), jnp.float32))
            )
            n += 1
        return n

    def __call__(self, audio: np.ndarray, rng=None, stream_vocoder=None) -> np.ndarray:
        """audio (T,) float32 in [-1,1] -> converted waveform (T',)."""
        return self.convert_batch([audio], rng=rng, stream_vocoder=stream_vocoder)[0]

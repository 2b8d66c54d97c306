"""Inference engines: host adapters that own a flax module + params +
frontend + tokenizer and expose batched ``transcribe``-style calls.

This is the glue the reference keeps inside each model's ``inference()``
(e.g. paraformer/model.py:443): audio loading, fbank, device calls, token
decoding.  TPU discipline: every device call is a jitted program keyed by a
quantized batch shape, so the jit cache stays small and hot.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from funasr_tpu.ops import fbank as F
from funasr_tpu.utils.postprocess import (
    rich_transcription_postprocess,
    sentence_postprocess,
)
from funasr_tpu.utils.timestamp_tools import (
    ts_from_cif_peaks,
    ts_prediction_lfr6_batch,
    ts_prediction_lfr6_standard,
)


def quantize(n: int, step: int = 2000, minimum: int = 4000) -> int:
    """Pad a sample count to a bucket boundary.

    Graduated: fine 0.125 s steps up to 16 s keep short-utterance padding
    negligible; past that the step grows with length (1 s to 60 s, 4 s to
    4 min, 15 s beyond), so padding waste stays under ~7% while the
    number of distinct compiled programs a long-audio server can ever see
    is bounded — a cold flagship compile is minutes, so an unbounded
    bucket set (one per 0.125 s of utterance length) is a serving hazard.
    """
    if n > 240 * 16000:
        step = 240000        # 15 s
    elif n > 60 * 16000:
        step = 64000         # 4 s
    elif n > 16 * 16000:
        step = 16000         # 1 s
    return max(minimum, step * ((n + step - 1) // step))


class FrontendConfig:
    def __init__(self, fs=16000, n_mels=80, lfr_m=7, lfr_n=6, cmvn=None,
                 window="hamming", dither=0.0, use_pallas="auto", **kw):
        self.fs = fs
        self.n_mels = n_mels
        self.lfr_m = lfr_m
        self.lfr_n = lfr_n
        self.window = window
        # dither is train-path state (bin/train.py featurize applies it
        # with a step-seeded key, reference wav_frontend.py:131);
        # device_features below is the SERVING extractor and stays
        # deterministic (dither=0), matching the reference C++ runtime's
        # kaldi-native-fbank inference configs.
        self.dither = dither
        # fused Pallas fbank kernel (TPU): same semantics, no materialized
        # frame tensor; requires 16k/hamming/25ms/10ms.  XLA's fbank
        # lowering is catastrophically slow on TPU (183 ms vs 3.2 ms for
        # 600 s of audio, r5 profile) so "auto" turns the kernel on
        # whenever the default backend is a TPU; CPU (tests) keeps the
        # reference XLA path, which is parity-pinned against the Pallas
        # one by tests/test_fbank_pallas.py.
        if use_pallas == "auto":
            try:  # same gate as the other Pallas ops (ops/*_pallas.py)
                use_pallas = jax.devices()[0].platform != "cpu"
            except Exception:
                use_pallas = False
        self.use_pallas = bool(use_pallas) and fs == 16000 \
            and window == "hamming"
        if cmvn is None:
            dim = n_mels * lfr_m
            cmvn = np.stack([np.zeros(dim, np.float32), np.ones(dim, np.float32)])
        self.cmvn = jnp.asarray(cmvn)

    def raw_fbank(self, wav: jnp.ndarray, lengths: jnp.ndarray):
        """Mel fbank only — no LFR/CMVN.  Kaldi frames are windowed
        independently (each output frame is a function of exactly its 400
        samples), so a slice of this grid at a 160-sample-aligned offset
        is BIT-IDENTICAL to running fbank on the sliced waveform — the
        long-audio pipeline computes it once over the whole recording and
        gathers per-VAD-segment frames from it (``features_from_fbank``)
        instead of re-running fbank per segment."""
        if self.use_pallas:
            from funasr_tpu.ops.fbank_pallas import fbank_pallas

            return fbank_pallas(wav, lengths, num_mel_bins=self.n_mels)
        return F.fbank(
            wav, lengths, num_mel_bins=self.n_mels, fs=self.fs,
            window_type=self.window, dither=0.0,
        )

    def features_from_fbank(self, feats: jnp.ndarray, flens: jnp.ndarray):
        """LFR + CMVN + frame padding on a precomputed raw fbank grid."""
        if self.lfr_m != 1 or self.lfr_n != 1:
            feats, flens = F.apply_lfr(feats, flens, self.lfr_m, self.lfr_n)
        feats = F.apply_cmvn(feats, self.cmvn)
        feats = F.pad_frames(feats, 128)
        return feats, flens

    def device_features(self, wav: jnp.ndarray, lengths: jnp.ndarray):
        feats, flens = self.raw_fbank(wav, lengths)
        return self.features_from_fbank(feats, flens)


class BatchedAsrEngine:
    """Shared batching scaffold for offline ASR engines.

    ``mesh``: optional ``jax.sharding.Mesh`` with a ``data`` axis — the
    jitted decode runs data-parallel over it (each device takes a batch
    shard; XLA inserts no collectives on this path).  The batch is padded
    to a multiple of the data-axis size with 1-frame silence rows; callers
    slice results back to the true count.
    """

    def __init__(self, frontend: FrontendConfig, tokenizer, mesh=None):
        self.frontend = frontend
        self.tokenizer = tokenizer
        self.mesh = mesh

    def _jit(self, fn, n_batch_args, static_argnames=()):
        """jit ``fn(params, *batch_args)`` — data-parallel if mesh given."""
        if self.mesh is not None:
            from funasr_tpu.parallel.mesh import dp_jit

            return dp_jit(fn, self.mesh, n_batch_args,
                          static_argnames=static_argnames)
        return jax.jit(fn, static_argnames=static_argnames)

    def _pack(self, wavs: Sequence[np.ndarray]):
        lens = np.array([len(w) for w in wavs], np.int64)
        n = len(wavs)
        if self.mesh is not None:
            ndev = self.mesh.shape.get("data", 1)
            n = -(-n // ndev) * ndev
        pad = quantize(int(lens.max(initial=1)))
        batch = np.zeros((n, pad), np.float32)
        for i, w in enumerate(wavs):
            batch[i, : len(w)] = w
        lens = np.concatenate(
            [lens, np.full((n - len(wavs),), 400, np.int64)])
        return jnp.asarray(batch), jnp.asarray(lens, jnp.int32)


class ParaformerEngine(BatchedAsrEngine):
    def __init__(self, module, params, frontend: FrontendConfig, tokenizer,
                 blank_id: int = 0, max_tokens_per_15s: int = 128,
                 mesh=None, sp_conf=None):
        super().__init__(frontend, tokenizer, mesh=mesh)
        self.module = module
        self.params = params
        self.blank_id = blank_id
        # NAR decodes include the trained sos/eos positions inside the
        # predictor's token count; the reference filters them BY ID
        # (e_paraformer/model.py:628 filters sos/eos/blank) rather than
        # relying on "<...>"-shaped token strings, so vocabularies whose
        # ids 1/2 aren't angle-bracketed can't leak them into text.
        # (Timestamp paths keep the string-based handling — their fire/
        # token alignment is torch-parity-pinned.)
        self._special_ids = {blank_id,
                             int(getattr(module, "sos", 1) or 1),
                             int(getattr(module, "eos", 2) or 2)}
        self.max_tokens_per_15s = max_tokens_per_15s

        def _run(params, wav, lens, max_tokens):
            feats, flens = self.frontend.device_features(wav, lens)
            log_probs, tok_lens, pred = self.module.apply(
                params, feats, flens, max_tokens=max_tokens,
                method=self.module.inference_logits,
            )
            tokens = jnp.argmax(log_probs, axis=-1)
            return tokens, tok_lens, pred.peaks, pred.alphas

        self._run = self._jit(_run, 2, static_argnames=("max_tokens",))

        # sequence-parallel serving (AutoModel sequence_parallel=N): the
        # frame axis shards over N devices through the full SP chain
        # (parallel/sp_cif.sp_paraformer_greedy — ring attention + halo
        # FSMN + sharded-prefix-sum CIF + sharded-memory decoder);
        # token-exact vs the single-device greedy path.
        self.sp_mesh = None
        if sp_conf:
            from funasr_tpu.parallel.mesh import make_mesh
            from funasr_tpu.parallel.sp_cif import sp_paraformer_greedy

            n = int(sp_conf["n"])
            if len(jax.devices()) < n:
                raise ValueError(
                    f"sequence_parallel={n} needs {n} devices, have "
                    f"{len(jax.devices())}")
            self.sp_mesh = make_mesh(data=1, model=n,
                                     devices=jax.devices()[:n])
            enc_c, dec_c, pred_c = (sp_conf["enc_conf"],
                                    sp_conf["dec_conf"],
                                    sp_conf["pred_conf"])

            @functools.partial(jax.jit, static_argnames=("max_tokens",))
            def _run_sp(params, wav, lens, max_tokens):
                feats, flens = self.frontend.device_features(wav, lens)
                return sp_paraformer_greedy(
                    params, feats, flens, self.sp_mesh,
                    enc_conf=enc_c, dec_conf=dec_c, pred_conf=pred_c,
                    max_tokens=max_tokens)

            self._run_sp = _run_sp

    def _max_tokens(self, n_samples: int) -> int:
        """Token budget for an utterance bucket: max_tokens_per_15s/15
        tokens per second, rounded up to 16 (one definition — the sync and
        async paths must trace IDENTICAL device programs to share jit
        cache).  Finer than per-15 s-window so a short-segment batch (the
        long-audio pipeline's bucketed packing) carries a proportionally
        short decoder grid: at 15 s this is exactly max_tokens_per_15s, at
        4 s it is 48, not 128 — the NAR decoder+CIF cost scales with it."""
        dur_s = n_samples / self.frontend.fs
        need = dur_s * self.max_tokens_per_15s / 15.0
        return max(16, int(np.ceil(need / 16.0)) * 16)

    def decode_fn(self, params, wav, lens):
        """Export surface: (params, wav, lens) -> (tokens, token_lengths)
        with static shapes (used by auto/export.py)."""
        max_tokens = self._max_tokens(wav.shape[1])
        tokens, tok_lens, _, _ = self._run(params, wav, lens, max_tokens)
        return tokens, tok_lens

    def transcribe(
        self, wavs: Sequence[np.ndarray], with_timestamp: bool = False,
        vad_offsets: Optional[Sequence[int]] = None, **kw,
    ) -> List[Dict[str, Any]]:
        if not len(wavs):
            return []
        wav_d, lens_d = self._pack(wavs)
        max_tokens = self._max_tokens(wav_d.shape[1])
        if self.sp_mesh is not None and not with_timestamp:
            tokens, tok_lens, _ = self._run_sp(self.params, wav_d, lens_d,
                                               max_tokens)
            tokens = np.asarray(tokens)
            tok_lens = np.asarray(tok_lens)
            results = []
            for i in range(len(wavs)):
                ids = [t for t in tokens[i, : int(tok_lens[i])].tolist()
                       if t not in self._special_ids]
                toks = self.tokenizer.ids2tokens(ids)
                text, words = sentence_postprocess(toks)
                results.append({"text": text, "raw_tokens": words})
            return results
        tokens, tok_lens, peaks, alphas = self._run(
            self.params, wav_d, lens_d, max_tokens
        )
        return self._host_results(len(wavs), tokens, tok_lens, peaks,
                                  alphas, with_timestamp, vad_offsets)

    def transcribe_async(self, wavs, with_timestamp: bool = False,
                         vad_offsets=None, **kw):
        """Dispatch the device program NOW, defer fetch + host postproc.

        Returns a zero-arg ``finalize()`` -> results.  jax's async dispatch
        queues successive batches back-to-back on device, so the caller's
        host work on batch k overlaps batch k+1's compute (the long-audio
        pipeline's detokenize/timestamp stage — reference
        auto_model.py:378's per-batch loop serializes them)."""
        if not len(wavs) or self.sp_mesh is not None:
            return lambda: self.transcribe(
                wavs, with_timestamp=with_timestamp,
                vad_offsets=vad_offsets, **kw)
        wav_d, lens_d = self._pack(wavs)
        max_tokens = self._max_tokens(wav_d.shape[1])
        out = self._run(self.params, wav_d, lens_d, max_tokens)
        return lambda: self._host_results(len(wavs), *out, with_timestamp,
                                          vad_offsets)

    def _host_results(self, n_wavs, tokens, tok_lens, peaks, alphas,
                      with_timestamp, vad_offsets):
        tokens = np.asarray(tokens)
        tok_lens = np.asarray(tok_lens)
        peaks = np.asarray(peaks)
        alphas = np.asarray(alphas)
        results = []
        for i in range(n_wavs):
            n = int(tok_lens[i])
            ids = [t for t in tokens[i, :n].tolist() if t != self.blank_id]
            toks = self.tokenizer.ids2tokens(ids)
            res: Dict[str, Any] = {}
            if with_timestamp:
                offset = (0 if vad_offsets is None or not len(vad_offsets) else vad_offsets[i])
                _, ts = ts_from_cif_peaks(
                    peaks[i], alphas[i], list(toks), vad_offset=offset
                )
                text, ts_kept, words = sentence_postprocess(toks, ts)
                res["timestamp"] = ts_kept
                res["raw_tokens"] = words
            else:
                text, words = sentence_postprocess(
                    [tk for t, tk in zip(ids, toks)
                     if t not in self._special_ids])
                res["raw_tokens"] = words
            res["text"] = text
            results.append(res)
        return results


class BiCifEngine(ParaformerEngine):
    """BiCifParaformer serving: frame-accurate 20 ms timestamps from the
    upsampled cif2 fire track (reference bicif_paraformer/model.py:135
    ``calc_predictor_timestamp`` + timestamp_tools.py:31)."""

    def __init__(self, module, params, frontend: FrontendConfig, tokenizer,
                 blank_id: int = 0, max_tokens_per_15s: int = 128,
                 mesh=None):
        super().__init__(module, params, frontend, tokenizer,
                         blank_id=blank_id,
                         max_tokens_per_15s=max_tokens_per_15s, mesh=mesh)

        def _run_ts(params, wav, lens, max_tokens):
            feats, flens = self.frontend.device_features(wav, lens)
            return self.module.apply(params, feats, flens,
                                     max_tokens=max_tokens,
                                     method=self.module.timestamps)

        self._run_ts = self._jit(_run_ts, 2, static_argnames=("max_tokens",))

    def transcribe(self, wavs, with_timestamp: bool = True,
                   vad_offsets=None, **kw) -> List[Dict[str, Any]]:
        if not len(wavs):
            return []
        if not with_timestamp:
            return super().transcribe(wavs, with_timestamp=False)
        wav_d, lens_d = self._pack(wavs)
        max_tokens = self._max_tokens(wav_d.shape[1])
        tokens, tok_lens, us_alphas, us_peaks = self._run_ts(
            self.params, wav_d, lens_d, max_tokens)
        return self._ts_results(wavs, tokens, tok_lens, us_alphas, us_peaks,
                                vad_offsets,
                                us_lens=self._us_lens([len(w) for w in wavs]))

    def transcribe_async(self, wavs, with_timestamp: bool = True,
                         vad_offsets=None, **kw):
        """Async-dispatch variant (see ParaformerEngine.transcribe_async)
        for the 20 ms-timestamp path."""
        if not len(wavs):
            return lambda: []
        if not with_timestamp:
            return ParaformerEngine.transcribe_async(
                self, wavs, with_timestamp=False, vad_offsets=vad_offsets,
                **kw)
        wav_d, lens_d = self._pack(wavs)
        max_tokens = self._max_tokens(wav_d.shape[1])
        out = self._run_ts(self.params, wav_d, lens_d, max_tokens)
        us_lens = self._us_lens([len(w) for w in wavs])
        return lambda: self._ts_results(wavs, *out, vad_offsets,
                                        us_lens=us_lens)

    # ---- shared-frontend path: decode VAD segments straight from a
    # precomputed whole-recording fbank grid (see FrontendConfig.raw_fbank:
    # slice-of-fbank == fbank-of-slice bit-exactly at 160-sample-aligned
    # segment starts, which VAD's 10 ms frame granularity guarantees).
    # The long-audio pipeline computes fbank ONCE (Pallas kernel) instead
    # of once per segment batch — the ASR stage's own fbank was ~1/3 of
    # its device time (r5 profile: 36.0 ms full vs 23.2 ms model-only).

    @staticmethod
    def quantize_frames(n: int, step: int = 96) -> int:
        return max(step, step * ((n + step - 1) // step))

    def _fb_runner(self):
        if not hasattr(self, "_run_ts_fb"):
            @functools.partial(jax.jit,
                               static_argnames=("max_tokens", "fmax"))
            def _run_ts_fb(params, raw, starts, nframes, max_tokens, fmax):
                idx = starts[:, None] + jnp.arange(fmax)[None, :]
                idx = jnp.clip(idx, 0, raw.shape[0] - 1)
                frames = raw[idx]  # (B, fmax, n_mels)
                feats, flens = self.frontend.features_from_fbank(
                    frames, nframes)
                return self.module.apply(params, feats, flens,
                                         max_tokens=max_tokens,
                                         method=self.module.timestamps)

            self._run_ts_fb = _run_ts_fb
        return self._run_ts_fb

    def pack_segments_frames(self, segments_ms, total_frames,
                             frame_shift_ms: int = 10):
        """[[start_ms, end_ms], ...] -> (starts, nframes) int32 arrays in
        fbank-frame units (25 ms window / 10 ms shift, snip-edges count)."""
        starts = np.asarray([s // frame_shift_ms for s, _ in segments_ms],
                            np.int32)
        ends = np.asarray([e for _, e in segments_ms], np.int64)
        seg_samples = (ends - np.asarray(
            [s for s, _ in segments_ms], np.int64)) * (self.frontend.fs
                                                       // 1000)
        win = int(0.025 * self.frontend.fs)
        shift = int(0.010 * self.frontend.fs)
        nframes = np.maximum((seg_samples - win) // shift + 1, 1)
        nframes = np.minimum(nframes,
                             np.maximum(total_frames - starts, 1))
        return starts, nframes.astype(np.int32)

    def transcribe_from_fbank(self, raw_fbank, segments_ms,
                              vad_offsets=None, total_frames=None, **kw):
        """BiCif decode of VAD segments from the shared fbank grid.
        ``raw_fbank``: (F, n_mels) device array (may be padded past the
        true frame count — pass ``total_frames``); ``segments_ms``:
        [[start_ms, end_ms], ...].  Returns the same records as
        ``transcribe(with_timestamp=True)``."""
        return self.transcribe_from_fbank_async(
            raw_fbank, segments_ms, vad_offsets,
            total_frames=total_frames, **kw)()

    def transcribe_from_fbank_async(self, raw_fbank, segments_ms,
                                    vad_offsets=None, total_frames=None,
                                    **kw):
        if not len(segments_ms):
            return lambda: []
        starts, nframes = self.pack_segments_frames(
            segments_ms, int(total_frames
                             if total_frames is not None
                             else raw_fbank.shape[0]))
        fmax = self.quantize_frames(int(nframes.max()))
        # token budget from the TRUE longest segment (not the padded fmax
        # grid) so this path clips at the same budget as the waveform path
        max_tokens = self._max_tokens(int(nframes.max()) * 160 + 240)
        out = self._fb_runner()(
            self.params, raw_fbank, jnp.asarray(starts),
            jnp.asarray(nframes), max_tokens, fmax)
        wavs = [None] * len(segments_ms)  # only len() used downstream
        us_lens = self._us_lens(nframes, in_frames=True)
        return lambda: self._ts_results(wavs, *out, vad_offsets,
                                        us_lens=us_lens)

    def _us_lens(self, n_samples_or_frames, in_frames: bool = False):
        """True upsampled-fire-track lengths per utterance: fbank frames ->
        LFR rows (ceil(frames/lfr_n)) -> x3 upsample.  Used to slice the
        padded (B, T*3) fire tracks so timestamps are PAD-INVARIANT (the
        tail-silence rule in ts_prediction_lfr6_standard reads the track
        length; without slicing, the last token's end drifted with the
        batch padding bucket)."""
        arr = np.asarray(n_samples_or_frames, np.int64)
        frames = arr if in_frames else np.maximum((arr - 400) // 160 + 1, 1)
        lfr = -(-frames // self.frontend.lfr_n)
        return (lfr * 3).astype(np.int64)

    def _ts_results(self, wavs, tokens, tok_lens, us_alphas, us_peaks,
                    vad_offsets, us_lens=None):
        tokens = np.asarray(tokens)
        tok_lens = np.asarray(tok_lens)
        us_alphas = np.asarray(us_alphas)
        us_peaks = np.asarray(us_peaks)
        B = len(wavs)
        toks_per = []
        for i in range(B):
            n = int(tok_lens[i])
            ids = [t for t in tokens[i, :n].tolist() if t != self.blank_id]
            toks_per.append(self.tokenizer.ids2tokens(ids))
        if us_lens is None:
            us_lens = np.full((B,), us_alphas.shape[1], np.int64)
        # one batched fire pass for the whole ASR batch (per-call form was
        # the pipeline's asr_host hot spot, BENCH_PIPELINE r5)
        ts_lists = ts_prediction_lfr6_batch(
            us_alphas, us_peaks, toks_per, us_lens, vad_offsets)
        results = []
        for toks, ts in zip(toks_per, ts_lists):
            text, ts_kept, words = sentence_postprocess(toks, ts)
            results.append({"text": text, "timestamp": ts_kept,
                            "raw_tokens": words})
        return results


class HotwordEngine(BiCifEngine):
    """SeacoParaformer / ContextualParaformer serving: hotword strings are
    tokenized into padded (H, L) grids per call; Seaco also yields BiCif
    timestamps in the same pass (reference seaco_paraformer/model.py:234)."""

    def __init__(self, module, params, frontend: FrontendConfig, tokenizer,
                 blank_id: int = 0, max_tokens_per_15s: int = 128,
                 mesh=None, seaco: bool = True):
        if seaco:
            # BiCifEngine init also builds the _run_ts timestamp path
            # (Seaco inherits BiCif's upsampled fire track)
            super().__init__(module, params, frontend, tokenizer,
                             blank_id=blank_id,
                             max_tokens_per_15s=max_tokens_per_15s,
                             mesh=mesh)
        else:
            # Contextual has no cif2 head: plain Paraformer fallback paths
            ParaformerEngine.__init__(
                self, module, params, frontend, tokenizer, blank_id=blank_id,
                max_tokens_per_15s=max_tokens_per_15s, mesh=mesh)
        self.seaco = seaco

        def _run_hw(params, wav, lens, hw_pad, hw_lens, max_tokens):
            feats, flens = self.frontend.device_features(wav, lens)
            return self.module.apply(
                params, feats, flens, hw_pad, hw_lens,
                max_tokens=max_tokens,
                method=self.module.decode_with_hotwords)

        self._run_hw = self._jit(_run_hw, 2, static_argnames=("max_tokens",))

    def _encode_hotwords(self, hotword):
        """'word1 word2' or list -> padded (H, L) id grid + lengths; Seaco
        appends the no-bias row (reference proc_hotword)."""
        words = hotword.split() if isinstance(hotword, str) else list(hotword)
        rows = [self.tokenizer.encode(w) for w in words]
        rows = [r for r in rows if len(r)]
        if self.seaco:
            rows.append([int(self.module.no_bias_id)])
        if not rows:
            return None, None
        L = max(8, max(len(r) for r in rows))
        pad = np.zeros((len(rows), L), np.int32)
        lens = np.zeros((len(rows),), np.int32)
        for i, r in enumerate(rows):
            pad[i, : len(r)] = r[:L]
            lens[i] = min(len(r), L)
        return jnp.asarray(pad), jnp.asarray(lens)

    def transcribe_async(self, wavs, hotword=None,
                         with_timestamp: bool = True, vad_offsets=None,
                         **kw):
        if hotword is not None:
            # hotword grids change shapes per call; keep that path sync
            return lambda: self.transcribe(
                wavs, hotword=hotword, with_timestamp=with_timestamp,
                vad_offsets=vad_offsets, **kw)
        if self.seaco:
            return super().transcribe_async(
                wavs, with_timestamp=with_timestamp,
                vad_offsets=vad_offsets, **kw)
        return ParaformerEngine.transcribe_async(
            self, wavs, with_timestamp=with_timestamp,
            vad_offsets=vad_offsets, **kw)

    def transcribe(self, wavs, hotword=None, with_timestamp: bool = True,
                   vad_offsets=None, **kw) -> List[Dict[str, Any]]:
        if not len(wavs):
            return []
        if hotword is None:
            if self.seaco:
                return super().transcribe(
                    wavs, with_timestamp=with_timestamp,
                    vad_offsets=vad_offsets)
            return ParaformerEngine.transcribe(
                self, wavs, with_timestamp=with_timestamp,
                vad_offsets=vad_offsets)
        hw_pad, hw_lens = self._encode_hotwords(hotword)
        wav_d, lens_d = self._pack(wavs)
        max_tokens = self._max_tokens(wav_d.shape[1])
        out = self._run_hw(self.params, wav_d, lens_d, hw_pad, hw_lens,
                           max_tokens)
        if self.seaco:
            tokens, tok_lens, us_alphas, us_peaks = out
            if with_timestamp:
                return self._ts_results(
                    wavs, tokens, tok_lens, us_alphas, us_peaks,
                    vad_offsets,
                    us_lens=self._us_lens([len(w) for w in wavs]))
        else:
            tokens, tok_lens = out
        tokens = np.asarray(tokens)
        tok_lens = np.asarray(tok_lens)
        results = []
        for i in range(len(wavs)):
            n = int(tok_lens[i])
            ids = [t for t in tokens[i, :n].tolist() if t != self.blank_id]
            toks = self.tokenizer.ids2tokens(ids)
            text, words = sentence_postprocess(toks)
            results.append({"text": text, "raw_tokens": words})
        return results


def _ctc_align_timestamps(align_row, tokens, offset_ms: int = 0,
                          frame_ms: int = 60):
    """Frame alignment -> [[start_ms, end_ms], ...] per non-blank token
    (reference sense_voice/model.py:932-960: groupby runs, 60 ms frames
    with a -30 ms half-frame shift, '▁' word separators dropped)."""
    from itertools import groupby

    ts = []
    start = 0
    token_id = 0
    n = len(align_row)
    for label, run in groupby(align_row):
        end = start + len(list(run))
        if label != 0 and token_id < len(tokens):
            left = max((start * frame_ms - 30) / 1000.0, 0.0)
            right = min((end * frame_ms - 30) / 1000.0,
                        (n * frame_ms - 30) / 1000.0)
            if tokens[token_id] != "▁":
                ts.append([int(left * 1000) + offset_ms,
                           int(right * 1000) + offset_ms])
            token_id += 1
        start = end
    return ts


class SenseVoiceEngine(BatchedAsrEngine):
    handles_itn = True  # text norm via the model's textnorm prompt token

    def __init__(self, module, params, frontend: FrontendConfig, tokenizer,
                 mesh=None):
        super().__init__(frontend, tokenizer, mesh=mesh)
        self.module = module
        self.params = params

        def _run(params, wav, lens, lid, tn):
            feats, flens = self.frontend.device_features(wav, lens)
            return self.module.apply(
                params, feats, flens, lid, tn, method=self.module.greedy_decode
            )

        self._run = self._jit(_run, 4)

    def decode_fn(self, params, wav, lens):
        """Export surface (lid=auto, textnorm off)."""
        from funasr_tpu.models.sense_voice.model import lid_id, textnorm_id

        B = wav.shape[0]
        lid = jnp.full((B,), lid_id("auto"), jnp.int32)
        tn = jnp.full((B,), textnorm_id(False), jnp.int32)
        return self._run(params, wav, lens, lid, tn)

    def transcribe(self, wavs, language="auto", use_itn=False,
                   rich_text: bool = True, with_timestamp: bool = False,
                   vad_offsets=None, **kw) -> List[Dict[str, Any]]:
        # with_timestamp: CTC forced-align stamps (reference
        # sense_voice/model.py:918 output_timestamp path)
        del kw
        from funasr_tpu.models.sense_voice.model import lid_id, textnorm_id

        if not len(wavs):
            return []
        wav_d, lens_d = self._pack(wavs)
        B = len(wavs)
        Bp = wav_d.shape[0]  # mesh-padded batch (== B without a mesh)
        lid = jnp.full((Bp,), lid_id(language), jnp.int32)
        tn = jnp.full((Bp,), textnorm_id(use_itn), jnp.int32)
        align = None
        if with_timestamp:
            if not hasattr(self, "_run_align"):
                def _ra(params, wav, lens, lid, tn):
                    feats, flens = self.frontend.device_features(wav, lens)
                    return self.module.apply(
                        params, feats, flens, lid, tn,
                        method=self.module.greedy_decode_with_alignment)

                self._run_align = self._jit(_ra, 2)
            tokens, tok_lens, align = self._run_align(
                self.params, wav_d, lens_d, lid, tn)
            align = np.asarray(align)
        else:
            tokens, tok_lens = self._run(self.params, wav_d, lens_d,
                                         lid, tn)
        tokens = np.asarray(tokens)
        tok_lens = np.asarray(tok_lens)
        results = []
        for i in range(B):
            ids = tokens[i, : int(tok_lens[i])].tolist()
            text = self.tokenizer.decode(ids)
            res = {"text": rich_transcription_postprocess(text) if rich_text else text,
                   "raw_text": text}
            if align is not None:
                offset = (0 if vad_offsets is None or not len(vad_offsets) else vad_offsets[i])
                toks = self.tokenizer.ids2tokens(ids[4:])
                res["timestamp"] = _ctc_align_timestamps(
                    align[i], toks, offset_ms=offset)
                res["raw_tokens"] = [t for t in toks if t != "▁"]
            results.append(res)
        return results


class HybridEngine(BatchedAsrEngine):
    """Joint CTC/attention models (Conformer/Transformer/Branchformer...):
    device beam decode, top-1 hypothesis detokenized."""

    def __init__(self, module, params, frontend: FrontendConfig, tokenizer,
                 beam: int = 10, maxlen: int = 96,
                 decoding_ctc_weight: float = 0.3):
        super().__init__(frontend, tokenizer)
        self.module = module
        self.params = params

        @functools.partial(jax.jit, static_argnames=("beam", "maxlen"))
        def _run(params, wav, lens, beam, maxlen):
            feats, flens = self.frontend.device_features(wav, lens)
            return self.module.apply(
                params, feats, flens, beam=beam, maxlen=maxlen,
                decoding_ctc_weight=decoding_ctc_weight,
                method=self.module.decode_beam)

        self._run = _run
        self.beam = beam
        self.maxlen = maxlen
        self._ctc_w = decoding_ctc_weight

    def decode_fn(self, params, wav, lens):
        """Export surface: top-1 beam hypothesis."""
        toks, tok_lens, _ = self._run(params, wav, lens, self.beam,
                                      self.maxlen)
        return toks[:, 0], tok_lens[:, 0]

    def transcribe(self, wavs: Sequence[np.ndarray], nbest: int = 1,
                   with_timestamp: bool = False, vad_offsets=None, **kw
                   ) -> List[Dict[str, Any]]:
        """``nbest > 1`` additionally returns the top-K hypotheses with
        scores under ``"nbest"`` — the tensor beam's answer to the
        reference WFST decoder's lattice/n-best outputs
        (runtime/onnxruntime/src/wfst-decoder.cpp GetNBestLattice role).
        ``with_timestamp=True`` CTC-force-aligns EVERY returned
        hypothesis so each n-best entry carries its own ``timestamp``
        list, like the lattice-backed word timings."""
        if not len(wavs):
            return []
        wav_d, lens_d = self._pack(wavs)
        align = enc_lens = None
        if with_timestamp:
            if not hasattr(self, "_run_align"):
                @functools.partial(jax.jit,
                                   static_argnames=("beam", "maxlen"))
                def _ra(params, wav, lens, beam, maxlen):
                    feats, flens = self.frontend.device_features(wav, lens)
                    return self.module.apply(
                        params, feats, flens, beam=beam, maxlen=maxlen,
                        decoding_ctc_weight=self._ctc_w,
                        method=self.module.decode_beam_align)

                self._run_align = _ra
            toks, tok_lens, scores, align, enc_lens = self._run_align(
                self.params, wav_d, lens_d, self.beam, self.maxlen)
            align = np.asarray(align)
            enc_lens = np.asarray(enc_lens)
        else:
            toks, tok_lens, scores = self._run(self.params, wav_d, lens_d,
                                               self.beam, self.maxlen)
        toks = np.asarray(toks)
        tok_lens = np.asarray(tok_lens)
        scores = np.asarray(scores)
        nbest = max(1, min(int(nbest), self.beam))

        def frame_ms(i):
            # encoder frame duration from the true fbank-frame count and
            # the encoder's output length (LFR x conv subsampling)
            nf = max((len(wavs[i]) - 400) // 160 + 1, 1)
            stride = max(int(round(nf / max(int(enc_lens[i]), 1))), 1)
            return 10 * stride

        def hyp_result(i, k):
            ids = toks[i, k, : int(tok_lens[i, k])].tolist()
            words = self.tokenizer.ids2tokens(ids)
            res: Dict[str, Any] = {"score": float(scores[i, k])}
            if align is not None:
                offset = (0 if vad_offsets is None or not len(vad_offsets)
                          else vad_offsets[i])
                ts = _ctc_align_timestamps(
                    align[i, k, : int(enc_lens[i])],
                    words, offset_ms=offset, frame_ms=frame_ms(i))
                text, ts_kept, raw = sentence_postprocess(words, ts)
                res.update(text=text, timestamp=ts_kept, raw_tokens=raw)
            else:
                text, raw = sentence_postprocess(words)
                res.update(text=text, raw_tokens=raw)
            res["tokens"] = ids
            return res

        results = []
        for i in range(len(wavs)):
            res = hyp_result(i, 0)
            res.pop("tokens")
            if nbest > 1:
                res["nbest"] = [hyp_result(i, k) for k in range(nbest)]
            results.append(res)
        return results


class TransducerEngine(BatchedAsrEngine):
    """RNN-T / BAT greedy device decode."""

    def __init__(self, module, params, frontend: FrontendConfig, tokenizer,
                 max_tokens: int = 128, blank_id: int = 0):
        super().__init__(frontend, tokenizer)
        self.module = module
        self.params = params
        self.blank_id = blank_id

        @functools.partial(jax.jit, static_argnames=("max_tokens",))
        def _run(params, wav, lens, max_tokens):
            feats, flens = self.frontend.device_features(wav, lens)
            return self.module.apply(params, feats, flens,
                                     max_tokens=max_tokens,
                                     method=self.module.greedy_decode)

        self._run = _run
        self.max_tokens = max_tokens

    def decode_fn(self, params, wav, lens):
        """Export surface: greedy RNN-T decode."""
        return self._run(params, wav, lens, self.max_tokens)

    def transcribe(self, wavs: Sequence[np.ndarray], **kw
                   ) -> List[Dict[str, Any]]:
        if not len(wavs):
            return []
        wav_d, lens_d = self._pack(wavs)
        toks, tok_lens = self._run(self.params, wav_d, lens_d,
                                   self.max_tokens)
        toks = np.asarray(toks)
        tok_lens = np.asarray(tok_lens)
        results = []
        for i in range(len(wavs)):
            ids = [t for t in toks[i, : int(tok_lens[i])].tolist()
                   if t != self.blank_id]
            words = self.tokenizer.ids2tokens(ids)
            text, raw = sentence_postprocess(words)
            results.append({"text": text, "raw_tokens": raw})
        return results


class WhisperEngine:
    """Whisper-family models from raw audio: whisper log-mel frontend +
    greedy decode; tokenizer optional (ids returned when absent)."""

    def __init__(self, model, tokenizer=None, max_tokens: int = 64,
                 forced_tokens=None):
        from funasr_tpu.frontends.whisper_frontend import WhisperFrontend

        self.model = model  # WhisperWrap / WhisperLID
        self.tokenizer = tokenizer
        self.max_tokens = max_tokens
        self.forced_tokens = list(forced_tokens or [])
        n_mels = getattr(model.config, "num_mel_bins", 80)
        self.frontend = WhisperFrontend(n_mels=n_mels)

    def transcribe(self, wavs: Sequence[np.ndarray], **kw
                   ) -> List[Dict[str, Any]]:
        if not len(wavs):
            return []
        feats = jnp.concatenate([self.frontend(w) for w in wavs], axis=0)
        toks = np.asarray(self.model.greedy_decode(
            feats, max_tokens=self.max_tokens,
            forced_tokens=self.forced_tokens))
        eos = self.model.config.eos_token_id
        results = []
        for i in range(len(wavs)):
            ids = toks[i].tolist()
            if eos in ids:
                ids = ids[: ids.index(eos)]
            text = (self.tokenizer.decode(ids)
                    if self.tokenizer is not None else "")
            results.append({"text": text, "raw_tokens": ids})
        return results


class VadEngine:
    def __init__(self, model, frontend: FrontendConfig):
        self.model = model  # FsmnVADStreaming wrapper
        self.frontend = frontend

        @jax.jit
        def _front(wav, lens):
            from funasr_tpu.models.fsmn_vad.model import \
                frame_decibel_device

            feats, flens = self.frontend.device_features(wav, lens)
            return feats, flens, frame_decibel_device(wav)

        self._front = _front

        # shared-frontend variant: ALSO returns the raw (pre-LFR/CMVN)
        # fbank grid so the downstream ASR engine can gather its segment
        # features from it instead of re-running fbank per batch
        # (engines.BiCifEngine.transcribe_from_fbank).  On the Pallas path
        # the VAD decibel track comes out of the SAME kernel pass
        # (fbank_pallas with_energy — the raw frame rows are already in
        # VMEM; a separate XLA energy pass cost 2.6 ms on 600 s, r5).
        @jax.jit
        def _front_shared(wav, lens):
            from funasr_tpu.models.fsmn_vad.model import \
                frame_decibel_device

            if self.frontend.use_pallas:
                from funasr_tpu.ops.fbank_pallas import fbank_pallas

                raw, rlens, db = fbank_pallas(
                    wav, lens, num_mel_bins=self.frontend.n_mels,
                    with_energy=True)
            else:
                raw, rlens = self.frontend.raw_fbank(wav, lens)
                db = frame_decibel_device(wav)
            feats, flens = self.frontend.features_from_fbank(raw, rlens)
            # FSMN scorer fused into the same program: the LFR'd feature
            # tensor never round-trips HBM between two dispatches (and a
            # program boundary's fixed cost goes away)
            post = self.model.score(feats)
            return raw, rlens, post, flens, db

        self._front_shared = _front_shared

    def segments(self, wav: np.ndarray) -> List[List[int]]:
        lens = jnp.asarray([len(wav)], jnp.int32)
        feats, flens, db = self._front(jnp.asarray(wav[None, :]), lens)
        return self.model.segments_offline(feats, wav,
                                           decibels=np.asarray(db)[0])

    def segments_shared(self, wav: np.ndarray):
        """(segments, raw_fbank (F, n_mels) device array) in one device
        program (fbank + LFR + decibels + FSMN scorer fused) — the raw
        grid feeds the ASR stage's shared frontend."""
        lens = jnp.asarray([len(wav)], jnp.int32)
        raw, rlens, post, flens, db = self._front_shared(
            jnp.asarray(wav[None, :]), lens)
        segs = self.model.segments_from_posteriors(
            np.asarray(post), decibels=np.asarray(db)[0])
        # raw stays padded on device (slicing to rlens would compile one
        # tiny program per distinct length); callers bound frame use with
        # the returned true frame count
        return segs, raw[0], int(rlens[0])

    def transcribe(self, wavs: Sequence[np.ndarray], **kw
                   ) -> List[Dict[str, Any]]:
        """Standalone-VAD generate contract (reference
        fsmn_vad_streaming/model.py:648 inference): ``value`` holds the
        [[start_ms, end_ms], ...] segment list; ``text`` stays empty."""
        del kw
        return [{"text": "", "value": self.segments(np.asarray(w))}
                for w in wavs]


class SpkEngine:
    """Speaker-embedding engine (reference auto_model.py:467-483 spk branch):
    batches fixed-length sv chunks through CAM++ on 80-mel fbank with
    per-utterance mean normalization (no LFR/CMVN)."""

    def __init__(self, module, variables, fs: int = 16000, n_mels: int = 80):
        self.module = module
        self.variables = variables
        self.fs = fs
        self.n_mels = n_mels

        @jax.jit
        def _run(variables, wav, lens):
            feats, flens = F.fbank(
                wav, lens, num_mel_bins=self.n_mels, fs=self.fs,
                window_type="hamming", dither=0.0,
            )
            mask = (jnp.arange(feats.shape[1])[None, :] < flens[:, None])
            maskf = mask[..., None].astype(feats.dtype)
            n = jnp.maximum(flens[:, None, None].astype(feats.dtype), 1.0)
            mean = jnp.sum(feats * maskf, axis=1, keepdims=True) / n
            feats = (feats - mean) * maskf
            return self.module.apply(variables, feats)

        self._run = _run

    def embed(self, wavs: Sequence[np.ndarray]) -> np.ndarray:
        """Chunk waveforms -> (N, emb_dim) embeddings; same-length chunks are
        batched into one device call (chunks are fixed 1.5 s on the main
        path, so this is one program)."""
        if not len(wavs):
            return np.zeros((0, 0), np.float32)
        order: Dict[int, List[int]] = {}
        for i, w in enumerate(wavs):
            order.setdefault(len(w), []).append(i)
        out: List[Optional[np.ndarray]] = [None] * len(wavs)
        for n, idxs in order.items():
            batch = jnp.asarray(np.stack([wavs[i] for i in idxs]))
            lens = jnp.full((len(idxs),), n, jnp.int32)
            emb = np.asarray(self._run(self.variables, batch, lens))
            for j, i in enumerate(idxs):
                out[i] = emb[j]
        return np.stack(out)


class PuncEngine:
    def __init__(self, model, tokenizer):
        self.model = model  # CTTransformerModel
        self.tokenizer = tokenizer

    def punctuate(self, text: str) -> Dict[str, Any]:
        return self.model.inference(text, self.tokenizer)

"""FSMN keyword spotting (reference funasr/models/fsmn_kws{,_mt}/: FSMN
acoustic model + CTC head, keywords detected by CTC prefix/Viterbi scoring).

The reference decodes keywords with a CTC prefix beam search restricted to
the keyword lattice (funasr/models/fsmn_kws/model.py + its decoder).  Here
detection is a device-resident CTC Viterbi over the standard blank-
interleaved keyword topology: for each keyword, a ``lax.scan`` over frames
maintains the best-path score of the keyword having *started anywhere*
(free entry at state 0 each frame) and fired when the final state peaks —
one fused program, batched over keywords via ``vmap``, no Python frame
loops.

Training: standard CTC loss on (keyword + filler) token targets.
"""

from __future__ import annotations

from typing import Any, Dict, List, NamedTuple, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
from jax import lax

from funasr_tpu import losses
from funasr_tpu.models.fsmn_vad.encoder import FSMN, FsmnBasicBlock
from funasr_tpu.registry import tables

Dtype = Any
NEG_INF = -1e30


def keyword_topology(keyword: jnp.ndarray, keyword_len: jnp.ndarray,
                     blank_id: int = 0):
    """Blank-interleaved CTC topology  b k1 b k2 ... kL b  (S = 2L+1).

    Returns (labels (S,), state_valid (S,) bool, can_skip (S,) bool): the
    per-state emission labels, the mask of states live for this keyword's
    true length, and which states admit the s-2 -> s skip transition (only
    non-blank states whose label differs from the previous non-blank).
    """
    L = keyword.shape[0]
    S = 2 * L + 1
    labels = jnp.full((S,), blank_id, jnp.int32)
    labels = labels.at[1::2].set(keyword)
    state_valid = jnp.arange(S) < 2 * keyword_len + 1
    prev_label = jnp.roll(labels, 2)
    can_skip = (jnp.arange(S) % 2 == 1) & (jnp.arange(S) >= 3) & \
        (labels != prev_label)
    return labels, state_valid, can_skip


def keyword_init_carry(max_len: int):
    """Fresh Viterbi carry (alpha (S,), steps (S,)) for a keyword padded to
    ``max_len`` tokens: free entry mass at the start states, zero steps."""
    S = 2 * max_len + 1
    return (jnp.full((S,), NEG_INF).at[0].set(0.0).at[1].set(0.0),
            jnp.zeros((S,), jnp.int32))


def keyword_viterbi_scan(log_probs: jnp.ndarray, carry, keyword: jnp.ndarray,
                         keyword_len: jnp.ndarray, n_frames: jnp.ndarray,
                         blank_id: int = 0):
    """Sliding CTC Viterbi over ``log_probs`` frames from an explicit carry.

    log_probs: (T, V); carry: (alpha (S,), steps (S,)) from
    ``keyword_init_carry`` or a previous chunk; n_frames: number of leading
    valid frames in this block.  Returns (new_carry, fins (T,)) where fins[t]
    is the per-frame-averaged score of the keyword's best alignment ending
    at local frame t (NEG_INF on padding frames).  The carry makes the same
    scan serve offline scoring and chunk-streaming detection.
    """
    labels, state_valid, can_skip = keyword_topology(
        keyword, keyword_len, blank_id)
    S = labels.shape[0]

    # track (best_logprob, frames_in_path) to length-normalize scores
    def step(c, inp):
        alpha, steps = c
        lp, t = inp
        stay = alpha
        move = jnp.concatenate([jnp.full((1,), NEG_INF), alpha[:-1]])
        skip = jnp.concatenate([jnp.full((2,), NEG_INF), alpha[:-2]])
        skip = jnp.where(can_skip, skip, NEG_INF)
        cand = jnp.stack([stay, move, skip])  # (3, S)
        best = jnp.argmax(cand, axis=0)
        alpha_new = jnp.take_along_axis(cand, best[None], 0)[0]
        steps_prev = jnp.stack([steps, jnp.concatenate([jnp.zeros(1, jnp.int32), steps[:-1]]),
                                jnp.concatenate([jnp.zeros(2, jnp.int32), steps[:-2]])])
        steps_new = jnp.take_along_axis(steps_prev, best[None], 0)[0]
        # free (re)entry at the start states
        enter = jnp.zeros((S,)).at[2:].set(NEG_INF)
        restart = enter > alpha_new
        alpha_new = jnp.where(restart, enter, alpha_new)
        steps_new = jnp.where(restart, 0, steps_new)
        alpha_new = alpha_new + lp[labels]
        steps_new = steps_new + 1
        alpha_new = jnp.where(state_valid, alpha_new, NEG_INF)
        # emit the final word state's score (keyword fully consumed); the
        # trailing-blank state is excluded so free blanks after the keyword
        # don't keep the normalized score flat and push end_frame late
        lastw = 2 * keyword_len - 1  # last non-blank state
        fin = alpha_new[lastw] / jnp.maximum(steps_new[lastw], 1)
        fin = jnp.where(t < n_frames, fin, NEG_INF)
        # padding frames must not advance the carry (streaming correctness:
        # the next chunk continues from the last *valid* frame)
        alpha_new = jnp.where(t < n_frames, alpha_new, alpha)
        steps_new = jnp.where(t < n_frames, steps_new, steps)
        return (alpha_new, steps_new), fin

    T = log_probs.shape[0]
    return lax.scan(step, carry, (log_probs, jnp.arange(T)))


def ctc_keyword_score(log_probs: jnp.ndarray, keyword: jnp.ndarray,
                      keyword_len: jnp.ndarray, n_frames: jnp.ndarray,
                      blank_id: int = 0):
    """Best sliding CTC Viterbi score of ``keyword`` inside ``log_probs``.

    log_probs: (T, V) frame log-posteriors; keyword: (L,) token ids (padded);
    keyword_len: true length; n_frames: valid frame count.
    Returns (score, end_frame): score = best per-frame-averaged log prob of
    the keyword's best alignment ending at any valid frame.

    Entry into state 0/1 is free at every frame (the keyword may start
    anywhere), which turns the classic CTC alignment into a sliding
    detector without windowing.
    """
    init = keyword_init_carry(keyword.shape[0])
    _, fins = keyword_viterbi_scan(log_probs, init, keyword, keyword_len,
                                   n_frames, blank_id)
    end_frame = jnp.argmax(fins)
    return fins[end_frame], end_frame


@tables.register("model_classes", "FsmnKWS")
class FsmnKWS:
    """Keyword spotter: FSMN AM + CTC head + device keyword search.

    ``detect(feats, flens, keywords)`` -> per-(utt, keyword) scores.
    """

    def __init__(self, vocab_size: int, encoder: str = "FSMN",
                 encoder_conf: Optional[Dict] = None, blank_id: int = 0,
                 threshold: float = -5.0, **kwargs):
        conf = dict(encoder_conf or {})
        conf.setdefault("input_dim", 400)
        conf.setdefault("input_affine_dim", 140)
        conf.setdefault("fsmn_layers", 4)
        conf.setdefault("linear_dim", 250)
        conf.setdefault("proj_dim", 128)
        conf.setdefault("lorder", 10)
        conf.setdefault("rorder", 2)
        conf.setdefault("lstride", 1)
        conf.setdefault("rstride", 1)
        conf.setdefault("output_affine_dim", 140)
        conf["output_dim"] = vocab_size
        conf["use_softmax"] = False  # CTC head: raw logits
        self.module = FSMN(**conf)
        self.vocab_size = vocab_size
        self.blank_id = blank_id
        self.threshold = threshold
        self.params = None
        self._build_jits()

    def _build_jits(self):
        @jax.jit
        def _logits(params, feats):
            return self.apply_logits(params, feats, None)

        @jax.jit
        def _search(params, feats, flens, keywords, kw_lens):
            logits = self.apply_logits(params, feats, flens)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)

            def per_utt(lp, n):
                return jax.vmap(
                    lambda kw, kl: ctc_keyword_score(lp, kw, kl, n,
                                                     self.blank_id)
                )(keywords, kw_lens)

            return jax.vmap(per_utt)(logp, flens)

        self._logits = _logits
        self._search = _search

    def apply_logits(self, params, feats, flens):
        """(B, T, D) features -> (B, T, V) CTC logits; subclass hook."""
        return self.module.apply(params, feats)

    def init_params(self, rng, input_dim: Optional[int] = None):
        d = input_dim or self.module.input_dim
        self.params = self.module.init(rng, jnp.zeros((1, 16, d)))
        return self.params

    def ctc_loss(self, params, feats, flens, text, text_lens, rng=None):
        logits = self.apply_logits(params, feats, flens)
        return losses.ctc_loss(logits, flens, text, text_lens,
                               ignore_id=-1, blank_id=self.blank_id)

    def detect(self, feats: np.ndarray, flens: np.ndarray,
               keywords: Sequence[Sequence[int]],
               threshold: Optional[float] = None) -> List[List[Dict]]:
        """Returns per-utterance keyword hits:
        [{"keyword_index", "score", "end_frame", "detected"}]."""
        thr = self.threshold if threshold is None else threshold
        kmax = max(len(k) for k in keywords)
        kw = np.zeros((len(keywords), kmax), np.int32)
        kl = np.zeros((len(keywords),), np.int32)
        for i, k in enumerate(keywords):
            kw[i, : len(k)] = k
            kl[i] = len(k)
        scores, ends = self._search(
            self.params, jnp.asarray(feats), jnp.asarray(flens, jnp.int32),
            jnp.asarray(kw), jnp.asarray(kl))
        scores = np.asarray(scores)
        ends = np.asarray(ends)
        out: List[List[Dict]] = []
        for b in range(scores.shape[0]):
            out.append([
                {"keyword_index": int(j), "score": float(scores[b, j]),
                 "end_frame": int(ends[b, j]),
                 "detected": bool(scores[b, j] > thr)}
                for j in range(scores.shape[1])
            ])
        return out


class _SanmKWSNet(nn.Module):
    """SANM encoder + CTC projection (reference funasr/models/sanm_kws)."""

    vocab_size: int
    input_dim: int = 400
    encoder_conf: Optional[Dict] = None

    def setup(self):
        from funasr_tpu.models.sanm import SANMEncoder

        conf = dict(self.encoder_conf or {})
        conf.setdefault("output_size", 128)
        conf.setdefault("attention_heads", 4)
        conf.setdefault("linear_units", 256)
        conf.setdefault("num_blocks", 4)
        conf.setdefault("kernel_size", 11)
        self.encoder = SANMEncoder(input_size=self.input_dim, name="encoder",
                                  **conf)
        self.ctc_lo = nn.Dense(self.vocab_size, name="ctc_lo")

    def __call__(self, feats, lengths):
        out, _ = self.encoder(feats, lengths, True)
        return self.ctc_lo(out)


@tables.register("model_classes", "SanmKWS")
class SanmKWS(FsmnKWS):
    """Keyword spotter with the SANM encoder (reference
    funasr/models/sanm_kws{,_streaming}); shares the sliding CTC Viterbi
    keyword search with FsmnKWS."""

    def __init__(self, vocab_size: int, input_dim: int = 400,
                 encoder_conf: Optional[Dict] = None, blank_id: int = 0,
                 threshold: float = -5.0, **kwargs):
        conf = dict(encoder_conf or {})
        if "sanm_shfit" in conf:  # reference template spelling
            conf["sanm_shift"] = conf.pop("sanm_shfit")
        self.module = _SanmKWSNet(vocab_size=vocab_size, input_dim=input_dim,
                                  encoder_conf=conf)
        self.vocab_size = vocab_size
        self.blank_id = blank_id
        self.threshold = threshold
        self.params = None
        self._input_dim = input_dim
        self._build_jits()

    def apply_logits(self, params, feats, flens):
        if flens is None:
            flens = jnp.full((feats.shape[0],), feats.shape[1], jnp.int32)
        return self.module.apply(params, feats, flens)

    def init_params(self, rng, input_dim: Optional[int] = None):
        d = input_dim or self._input_dim
        self.params = self.module.init(
            rng, jnp.zeros((1, 16, d)), jnp.array([16], jnp.int32))
        return self.params


@tables.register("encoder_classes", "FSMNMT")
class FSMNMT(nn.Module):
    """Multi-task FSMN: one trunk, two output heads (reference
    funasr/models/fsmn_kws_mt/encoder.py:28 ``FSMNMT``) — head 1 scores the
    keyword vocabulary, head 2 the full ASR vocabulary."""

    input_dim: int
    input_affine_dim: int
    fsmn_layers: int
    linear_dim: int
    proj_dim: int
    lorder: int
    rorder: int
    lstride: int
    rstride: int
    output_affine_dim: int
    output_dim: int
    output_dim2: int
    use_softmax: bool = True
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, cache: Optional[List[jnp.ndarray]] = None):
        """x: (B, T, input_dim) -> ((B,T,output_dim), (B,T,output_dim2))."""
        h = nn.Dense(self.input_affine_dim, name="in_linear1",
                     dtype=self.dtype, param_dtype=self.param_dtype)(x)
        h = nn.Dense(self.linear_dim, name="in_linear2",
                     dtype=self.dtype, param_dtype=self.param_dtype)(h)
        h = nn.relu(h)
        new_caches = []
        for i in range(self.fsmn_layers):
            c = cache[i] if cache is not None else None
            h, nc = FsmnBasicBlock(
                self.linear_dim, self.proj_dim, self.lorder, self.rorder,
                self.lstride, self.rstride, self.dtype, self.param_dtype,
                name=f"fsmn_{i}",
            )(h, c)
            new_caches.append(nc)
        h1 = nn.Dense(self.output_affine_dim, name="out_linear1",
                      dtype=self.dtype, param_dtype=self.param_dtype)(h)
        h1 = nn.Dense(self.output_dim, name="out_linear2",
                      dtype=self.dtype, param_dtype=self.param_dtype)(h1)
        h2 = nn.Dense(self.output_affine_dim, name="out_linear1_2",
                      dtype=self.dtype, param_dtype=self.param_dtype)(h)
        h2 = nn.Dense(self.output_dim2, name="out_linear2_2",
                      dtype=self.dtype, param_dtype=self.param_dtype)(h2)
        if self.use_softmax:
            h1 = nn.softmax(h1.astype(jnp.float32), axis=-1)
            h2 = nn.softmax(h2.astype(jnp.float32), axis=-1)
        if cache is not None:
            return (h1, h2), new_caches
        return h1, h2

    def init_cache(self, batch_size: int = 1):
        left_hist = (self.lorder - 1) * self.lstride
        return [
            jnp.zeros((batch_size, left_hist, self.proj_dim), jnp.float32)
            for _ in range(self.fsmn_layers)
        ]


@tables.register("model_classes", "FsmnKWSMT")
class FsmnKWSMT(FsmnKWS):
    """Multi-task keyword spotter (reference funasr/models/fsmn_kws_mt/
    model.py:27 ``FsmnKWSMT``): shared FSMN trunk, CTC head 1 over the
    keyword vocabulary, CTC head 2 over the ASR vocabulary, joint loss
    0.5*ctc1 + 0.5*ctc2 (model.py:127).  Detection runs on head 1 via the
    same sliding Viterbi as ``FsmnKWS``."""

    def __init__(self, vocab_size: Sequence[int] = (8, 32),
                 encoder: str = "FSMNMT",
                 encoder_conf: Optional[Dict] = None, blank_id: int = 0,
                 threshold: float = -5.0, **kwargs):
        conf = dict(encoder_conf or {})
        conf.setdefault("input_dim", 400)
        conf.setdefault("input_affine_dim", 140)
        conf.setdefault("fsmn_layers", 4)
        conf.setdefault("linear_dim", 250)
        conf.setdefault("proj_dim", 128)
        conf.setdefault("lorder", 10)
        conf.setdefault("rorder", 2)
        conf.setdefault("lstride", 1)
        conf.setdefault("rstride", 1)
        conf.setdefault("output_affine_dim", 140)
        conf["output_dim"] = vocab_size[0]
        conf["output_dim2"] = vocab_size[1]
        conf["use_softmax"] = False
        self.module = FSMNMT(**conf)
        self.vocab_size = vocab_size[0]
        self.blank_id = blank_id
        self.threshold = threshold
        self.params = None
        self._build_jits()

    def apply_logits(self, params, feats, flens):
        return self.module.apply(params, feats)[0]

    def ctc_loss(self, params, feats, flens, text, text_lens,
                 text2=None, text2_lens=None, rng=None):
        """0.5 * CTC(keyword head) + 0.5 * CTC(ASR head) when text2 is given
        (reference model.py:127); keyword-head-only otherwise."""
        logits1, logits2 = self.module.apply(params, feats)
        loss = losses.ctc_loss(logits1, flens, text, text_lens,
                               ignore_id=-1, blank_id=self.blank_id)
        if text2 is None:
            return loss
        loss2 = losses.ctc_loss(logits2, flens, text2, text2_lens,
                                ignore_id=-1, blank_id=self.blank_id)
        return 0.5 * loss + 0.5 * loss2


class KWSStreamState(NamedTuple):
    """Device state of a streaming keyword-spotting session: the encoder KV
    rings plus the per-(utterance, keyword) Viterbi carry, so each chunk is
    one jitted step and detection never revisits old frames."""

    enc: Any  # EncChunkState
    vit_alpha: jnp.ndarray  # (B, K, S) Viterbi scores
    vit_steps: jnp.ndarray  # (B, K, S) path lengths
    best: jnp.ndarray  # (B, K) best score so far
    best_end: jnp.ndarray  # (B, K) global end frame of the best score
    start_idx: jnp.ndarray  # (B,) int32 per-stream global frame offset


@tables.register("model_classes", "SanmKWSStreaming")
class SanmKWSStreaming(SanmKWS):
    """Streaming SANM keyword spotter (reference
    funasr/models/sanm_kws_streaming/model.py:38 ``SanmKWSStreaming``, which
    chunk-decodes with the SCAMA overlap-chunk encoder).

    TPU design: instead of re-encoding overlapping windows, each chunk runs
    once through the SANM layers with per-layer attention-KV ring caches
    (the ParaformerStreaming machinery), and the sliding CTC Viterbi carry
    (alpha, steps) persists across chunks — detection state is an explicit
    pytree and every 600 ms chunk is a single jitted program.
    """

    def init_stream(self, keywords: Sequence[Sequence[int]], batch: int = 1,
                    chunk_frames: int = 60, cache_frames: int = 120):
        from funasr_tpu.models.paraformer_streaming.functional import (
            dense, encoder_chunk, init_enc_state)

        enc = self.module.encoder_conf or {}
        d_model = dict(enc).get("output_size", 128)
        n_head = dict(enc).get("attention_heads", 4)
        kernel = dict(enc).get("kernel_size", 11)
        n_blocks = dict(enc).get("num_blocks", 4)

        kmax = max(len(k) for k in keywords)
        kw = np.zeros((len(keywords), kmax), np.int32)
        kl = np.zeros((len(keywords),), np.int32)
        for i, k in enumerate(keywords):
            kw[i, : len(k)] = k
            kl[i] = len(k)
        self._kw = jnp.asarray(kw)
        self._kl = jnp.asarray(kl)
        K, S = len(keywords), 2 * kmax + 1
        alpha0, steps0 = keyword_init_carry(kmax)

        state = KWSStreamState(
            enc=init_enc_state(n_blocks, batch, cache_frames, d_model),
            vit_alpha=jnp.broadcast_to(alpha0, (batch, K, S)),
            vit_steps=jnp.broadcast_to(steps0, (batch, K, S)),
            best=jnp.full((batch, K), NEG_INF),
            best_end=jnp.zeros((batch, K), jnp.int32),
            start_idx=jnp.zeros((batch,), jnp.int32),
        )

        blank = self.blank_id

        @jax.jit
        def step(params, chunk, chunk_valid, st: KWSStreamState):
            p = params["params"]
            W = chunk.shape[1]
            out, enc_state = encoder_chunk(
                p["encoder"], chunk, st.enc, st.start_idx, chunk_valid,
                n_head=n_head, kernel_size=kernel, d_model=d_model, keep=W,
                overlap=0)  # KWS windows carry no overlap cache
            logits = dense(p["ctc_lo"], out)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)

            def per_kw(lp, nf, carry_a, carry_s, kw_i, kl_i):
                (a, s), fins = keyword_viterbi_scan(
                    lp, (carry_a, carry_s), kw_i, kl_i, nf, blank)
                return a, s, fins

            def per_utt(lp, nf, ca, cs):
                return jax.vmap(per_kw, in_axes=(None, None, 0, 0, 0, 0))(
                    lp, nf, ca, cs, self._kw, self._kl)

            a, s, fins = jax.vmap(per_utt)(
                logp, chunk_valid, st.vit_alpha, st.vit_steps)  # (B,K,S)/(B,K,W)
            chunk_best = jnp.max(fins, axis=-1)
            chunk_end = (st.start_idx[:, None]
                         + jnp.argmax(fins, axis=-1).astype(jnp.int32))
            better = chunk_best > st.best
            return KWSStreamState(
                enc=enc_state,
                vit_alpha=a, vit_steps=s,
                best=jnp.where(better, chunk_best, st.best),
                best_end=jnp.where(better, chunk_end, st.best_end),
                # per-row: streams in one batch may carry different valid
                # frame counts per chunk
                start_idx=st.start_idx + chunk_valid.astype(jnp.int32),
            )

        self._stream_step = step
        return state

    def detect_chunk(self, state: KWSStreamState, feats: np.ndarray,
                     valid: Optional[np.ndarray] = None,
                     threshold: Optional[float] = None):
        """One chunk of (B, W, D) features -> (state', hits snapshot)."""
        thr = self.threshold if threshold is None else threshold
        B, W, _ = feats.shape
        if valid is None:
            valid = np.full((B,), W, np.int32)
        state = self._stream_step(self.params, jnp.asarray(feats),
                                  jnp.asarray(valid, jnp.int32), state)
        best = np.asarray(state.best)
        ends = np.asarray(state.best_end)
        hits = [[{"keyword_index": int(j), "score": float(best[b, j]),
                  "end_frame": int(ends[b, j]),
                  "detected": bool(best[b, j] > thr)}
                 for j in range(best.shape[1])]
                for b in range(best.shape[0])]
        return state, hits

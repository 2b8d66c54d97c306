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

from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
from jax import lax

from funasr_tpu import losses
from funasr_tpu.models.fsmn_vad.encoder import FSMN
from funasr_tpu.registry import tables

Dtype = Any
NEG_INF = -1e30


def ctc_keyword_score(log_probs: jnp.ndarray, keyword: jnp.ndarray,
                      keyword_len: jnp.ndarray, n_frames: jnp.ndarray,
                      blank_id: int = 0):
    """Best sliding CTC Viterbi score of ``keyword`` inside ``log_probs``.

    log_probs: (T, V) frame log-posteriors; keyword: (L,) token ids (padded);
    keyword_len: true length; n_frames: valid frame count.
    Returns (score, end_frame): score = best per-frame-averaged log prob of
    the keyword's best alignment ending at any valid frame.

    Topology: blank-interleaved states  b k1 b k2 ... kL b  (S = 2L+1).
    Entry into state 0/1 is free at every frame (the keyword may start
    anywhere), which turns the classic CTC alignment into a sliding
    detector without windowing.
    """
    L = keyword.shape[0]
    S = 2 * L + 1
    labels = jnp.full((S,), blank_id, jnp.int32)
    labels = labels.at[1::2].set(keyword)
    state_valid = jnp.arange(S) < 2 * keyword_len + 1
    # allowed skip transition s-2 -> s: only onto non-blank states whose
    # label differs from the previous non-blank label
    prev_label = jnp.roll(labels, 2)
    can_skip = (jnp.arange(S) % 2 == 1) & (jnp.arange(S) >= 3) & \
        (labels != prev_label)

    # track (best_logprob, frames_in_path) to length-normalize scores
    def step(carry, inp):
        alpha, steps = carry
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
        return (alpha_new, steps_new), fin

    T = log_probs.shape[0]
    init = (jnp.full((S,), NEG_INF).at[0].set(0.0).at[1].set(0.0),
            jnp.zeros((S,), jnp.int32))
    _, fins = lax.scan(step, init,
                       (log_probs, jnp.arange(T)))
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
        self.module = _SanmKWSNet(vocab_size=vocab_size, input_dim=input_dim,
                                  encoder_conf=encoder_conf)
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

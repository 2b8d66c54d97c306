"""CTC forced alignment (Viterbi over the blank-interleaved lattice).

Reference: funasr/models/sense_voice/utils/ctc_alignment.py
``ctc_forced_align`` — aligns a target label sequence to a CTC emission,
returning per-frame label ids (blank between/within tokens), which the
SenseVoice inference turns into frame-accurate timestamps
(sense_voice/model.py:925).

TPU form: the DP is two ``lax.scan``s with STATIC (B, T, 2U+1) shapes —
a forward max-product pass emitting backpointers, and a reverse pass
walking them — so the whole alignment jits into the decode program (no
host Viterbi).  Per-utterance lengths are handled by masking pad frames
to "free blank" columns (log-prob 0 for blank, -inf otherwise): the
surviving end states at the true length are exactly the reference's
{S-2, S-1}, and frames beyond the length decode as trailing blanks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

NEG_INF = -1e30


def ctc_forced_align(log_probs: jnp.ndarray, targets: jnp.ndarray,
                     input_lengths: jnp.ndarray,
                     target_lengths: jnp.ndarray,
                     blank: int = 0) -> jnp.ndarray:
    """log_probs (B, T, C); targets (B, U) (blank-padded);
    input_lengths/target_lengths (B,).  Returns (B, T) aligned label ids
    (``blank`` on non-emitting frames; pad frames are blank)."""
    B, T, C = log_probs.shape
    U = targets.shape[1]
    S = 2 * U + 1

    # blank-interleaved target row: [blank, y1, blank, y2, ..., blank]
    ext = jnp.full((B, S), blank, targets.dtype)
    ext = ext.at[:, 1::2].set(targets)
    pos = jnp.arange(S)
    # s -> s-2 skips are legal only across DIFFERENT labels (and not
    # into leading states)
    diff = jnp.concatenate(
        [jnp.zeros((B, 2), bool), ext[:, 2:] != ext[:, :-2]], axis=1)
    # states beyond 2*target_length are invalid
    valid_state = pos[None, :] <= (2 * target_lengths[:, None])

    lp = log_probs.astype(jnp.float32)
    # pad frames: blank free, labels forbidden
    tmask = jnp.arange(T)[None, :] < input_lengths[:, None]
    pad_row = jnp.full((C,), NEG_INF, jnp.float32).at[blank].set(0.0)
    lp = jnp.where(tmask[:, :, None], lp, pad_row[None, None, :])
    # emission per (t, s): lp[t, ext[s]]
    idx = jnp.broadcast_to(ext[:, None, :].astype(jnp.int32), (B, T, S))
    em = jnp.take_along_axis(lp, idx, axis=-1)             # (B, T, S)
    em = jnp.where(valid_state[:, None, :], em, NEG_INF)

    score0 = jnp.full((B, S), NEG_INF, jnp.float32)
    score0 = score0.at[:, 0].set(em[:, 0, 0])
    score0 = score0.at[:, 1].set(jnp.where(target_lengths > 0,
                                           em[:, 0, 1], NEG_INF))

    neg = jnp.full((B, 1), NEG_INF, jnp.float32)

    def fwd(score, em_t):
        stay = score
        step = jnp.concatenate([neg, score[:, :-1]], axis=1)
        skip = jnp.where(diff, jnp.concatenate([neg, neg, score[:, :-2]],
                                               axis=1), NEG_INF)
        stacked = jnp.stack([stay, step, skip])            # (3, B, S)
        bp = jnp.argmax(stacked, axis=0)                   # (B, S)
        best = jnp.max(stacked, axis=0)
        return em_t + best, bp.astype(jnp.int8)

    scoreT, bps = lax.scan(fwd, score0, jnp.swapaxes(em, 0, 1)[1:])
    # bps: (T-1, B, S) for t = 1..T-1

    # end state: better of S-2 (last label) and S-1 (trailing blank),
    # evaluated at the FINAL step (pad frames only allow blank-stays /
    # blank-steps, so this equals the choice at input_length-1)
    e1 = 2 * target_lengths - 1
    e2 = 2 * target_lengths
    s_end = jnp.where(
        jnp.take_along_axis(scoreT, e1[:, None], 1)[:, 0]
        >= jnp.take_along_axis(scoreT, e2[:, None], 1)[:, 0], e1, e2)
    s_end = jnp.maximum(s_end, 0).astype(jnp.int32)

    def bwd(s, bp_t):
        b = jnp.take_along_axis(bp_t.astype(jnp.int32), s[:, None],
                                1)[:, 0]
        return (s - b).astype(jnp.int32), s  # emit s_t, carry s_{t-1}

    s0, states_tail = lax.scan(bwd, s_end, bps, reverse=True)
    # states_tail[i] = s_{i+1} (scan ys align with xs order); prepend s_0
    states = jnp.concatenate([s0[None], states_tail], axis=0)  # (T, B)

    align = jnp.take_along_axis(ext, jnp.swapaxes(states, 0, 1), axis=1)
    return jnp.where(tmask, align, blank)

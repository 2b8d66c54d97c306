"""Device-resident joint CTC/attention beam search.

The reference beam search (funasr/models/transformer/search.py:34
``BeamSearch`` + scorers/ctc_prefix_score.py:12 ``CTCPrefixScoreTH``) drives
Python ``Hypothesis`` objects per utterance.  Here the whole search is one
jitted ``lax.while_loop`` over decode steps with fixed beam tensors:

- hypotheses: (B, K, L+1) token grid, (B, K) scores, (B, K) finished flags;
  the loop exits as soon as every hypothesis emitted eos,
- attention scores per step either from a KV-CACHED incremental scorer
  (``step_score_fn`` — ops/cached_decoder.py, the reference
  forward_one_step semantics; cache pytree gathered on beam reorder) or
  from a full-prefix decoder call (``decode_fn`` fallback),
- CTC prefix scores via the standard (r_nb, r_b) recurrence over encoder
  frames — ONE fused Pallas kernel per step on TPU
  (ops/ctc_prefix_pallas.py) or a lax.scan elsewhere — evaluated only for
  the ``pre_beam`` best attention candidates per hyp (espnet pre-beam
  semantics),
- length bonus added per emitted token.

Frame masking: CTC log-probs must be prepared with ``mask_ctc_frames`` so
padded frames are (blank: 0, others: -inf) — they then leave prefix scores
unchanged.

Measured on the real chip (BENCH_BEAM.json, r5): 1,933 audio-s/s at
B=32 with the int8 KV cache (per_batch 8/16/32 = 1,894/1,829/1,933) for
the full conformer_hybrid config — r4: 1,028 (B=8, bf16 cache, 3-D
top_k); r3 full-prefix form: 72.1; reference 32-thread Xeon ONNX
server: 562.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

NEG_INF = -1.0e10


def mask_ctc_frames(ctc_logp: jnp.ndarray, lengths: jnp.ndarray,
                    blank_id: int = 0) -> jnp.ndarray:
    """Make padded frames transparent to the prefix recurrence."""
    B, T, V = ctc_logp.shape
    valid = (lax.broadcasted_iota(jnp.int32, (1, T), 1) < lengths[:, None])
    pad_row = jnp.full((V,), NEG_INF).at[blank_id].set(0.0)
    return jnp.where(valid[:, :, None], ctc_logp, pad_row[None, None, :])


def _logaddexp(a, b):
    mx = jnp.maximum(a, b)
    mx = jnp.maximum(mx, NEG_INF)  # avoid -inf - -inf
    return mx + jnp.log(jnp.exp(a - mx) + jnp.exp(b - mx))


def _ctc_recurrence(xg, xb, phi_shift):
    """The per-frame CTC prefix recurrence (espnet CTCPrefixScorer):

        r_nb[t] = xg[t] + logaddexp(r_nb[t-1], phi_shift[t])
        r_b[t]  = xb[t] + logaddexp(r_b[t-1],  r_nb[t-1])

    This sequential scan is the DEFAULT: an associative-scan variant
    (``_ctc_recurrence_associative`` below) was measured on the real
    chip and did NOT win (1.73 vs 1.67 s/beam-batch at T=376) — the
    log-semiring 2x2 composition's 6 tensors x ~log2(T) rounds of HBM
    traffic cancels the latency saving of collapsing the T-chain.
    xg/phi_shift (B, K, W, T); xb (B, T).  Returns two (B, K, W, T)."""
    B, K, W, T = xg.shape

    def step(carry, t):
        r_nb, r_b = carry  # (B, K, W)
        r_nb_new = xg[..., t] + _logaddexp(r_nb, phi_shift[..., t])
        r_b_new = xb[:, None, None, t] + _logaddexp(r_b, r_nb)
        return (r_nb_new, r_b_new), (r_nb_new, r_b_new)

    init = (jnp.full((B, K, W), NEG_INF), jnp.full((B, K, W), NEG_INF))
    (_, _), (r_nb_seq, r_b_seq) = lax.scan(step, init, jnp.arange(T))
    return jnp.moveaxis(r_nb_seq, 0, 3), jnp.moveaxis(r_b_seq, 0, 3)


def _ctc_recurrence_associative(xg, xb, phi_shift):
    """Associative-scan form of ``_ctc_recurrence``: the state
    (r_nb, r_b) update is an AFFINE map in the (logsumexp, +) semiring —

        s[t] = A[t] (x) s[t-1]  (+)  c[t],
        A[t] = [[xg[t], -inf], [xb[t], xb[t]]],
        c[t] = [xg[t] + phi_shift[t], -inf]

    — and affine maps compose associatively, collapsing the T-chain to
    ~log2(T) parallel rounds.  MEASURED NO-WIN on the real chip (see
    the default's docstring): kept as the documented alternative (and
    parity-tested) because the trade flips if T grows or the per-round
    tensors fit VMEM.  With the all--inf initial state the answer is the
    composed constant part, so only (A, c) prefix-compositions are
    needed."""
    B, K, W, T = xg.shape
    xbb = jnp.broadcast_to(xb[:, None, None, :], (B, K, W, T))
    ninf = jnp.full((B, K, W, T), NEG_INF, xg.dtype)
    # element tensors, time-major last axis kept: (B, K, W, T)
    a11, a12 = xg, ninf
    a21, a22 = xbb, xbb
    c1, c2 = xg + phi_shift, ninf

    def compose(first, later):
        f11, f12, f21, f22, fc1, fc2 = first
        l11, l12, l21, l22, lc1, lc2 = later
        # A = L (x) F   (log-semiring 2x2 matmul)
        n11 = _logaddexp(l11 + f11, l12 + f21)
        n12 = _logaddexp(l11 + f12, l12 + f22)
        n21 = _logaddexp(l21 + f11, l22 + f21)
        n22 = _logaddexp(l21 + f12, l22 + f22)
        # c = L (x) fc (+) lc
        nc1 = _logaddexp(_logaddexp(l11 + fc1, l12 + fc2), lc1)
        nc2 = _logaddexp(_logaddexp(l21 + fc1, l22 + fc2), lc2)
        return n11, n12, n21, n22, nc1, nc2

    _, _, _, _, rc1, rc2 = lax.associative_scan(
        compose, (a11, a12, a21, a22, c1, c2), axis=3)
    return rc1, rc2


def ctc_prefix_step(
    x_t: jnp.ndarray,  # (B, V, T) TRANSPOSED masked ctc log-probs
    r_prev: jnp.ndarray,  # (B, K, T, 2) [nb, b] state of each prefix
    last: jnp.ndarray,  # (B, K) last token of each prefix
    cand: jnp.ndarray,  # (B, K, W) candidate extensions
    prefix_empty: jnp.ndarray,  # (B, K) bool: prefix has no tokens yet
    blank_id: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Score extending each prefix with each candidate.

    ``x_t`` is time-minor ((B, V, T), transposed ONCE outside the decode
    loop): the per-candidate emission rows then come from a sublane row
    gather instead of a lane-axis take_along_axis over the vocab — the
    lane-axis form was the beam's hidden superlinear-in-B cost (r5: the
    CTC phase measured 79 ms of a 120 ms B=8 batch and 3.4 ms/step at
    B=32; a V-minor gather of K*W arbitrary vocab columns has no
    efficient TPU lowering).

    Returns (sigma (B,K,W) total prefix scores, r_new (B,K,W,T,2)).
    """
    B, K, T, _ = r_prev.shape
    W = cand.shape[-1]
    # xg[b,k,w,t] = x_t[b, cand[b,k,w], t]: row gather on the sublane axis
    xg = jnp.take_along_axis(x_t, cand.reshape(B, K * W, 1), axis=1)
    xg = xg.reshape(B, K, W, T)
    xb = x_t[:, blank_id, :]  # (B, T)

    r_nb_prev = r_prev[..., 0]  # (B, K, T)
    r_b_prev = r_prev[..., 1]
    same = cand == last[:, :, None]  # (B, K, W)
    # phi(t): mass of g ending at frame t usable before emitting v at t+1
    phi_all = _logaddexp(r_nb_prev, r_b_prev)  # (B, K, T)
    phi = jnp.where(same[..., None], r_b_prev[:, :, None, :],
                    phi_all[:, :, None, :])  # (B, K, W, T)
    phi0 = jnp.where(prefix_empty, 0.0, NEG_INF)[:, :, None]  # (B, K, 1)
    phi_shift = jnp.concatenate(
        [jnp.broadcast_to(phi0[..., None], (B, K, W, 1)), phi[..., :-1]], axis=-1
    )

    from funasr_tpu.ops import ctc_prefix_pallas as CP

    if CP.enabled():
        # one fused kernel for the whole frame chain (see module docstring
        # there) instead of T scan-step launches
        r_nb_seq, r_b_seq = CP.ctc_recurrence(xg, xb, phi_shift)
    else:
        r_nb_seq, r_b_seq = _ctc_recurrence(xg, xb, phi_shift)
    sigma = _logaddexp(r_nb_seq[..., -1], r_b_seq[..., -1])  # (B, K, W)
    r_new = jnp.stack([r_nb_seq, r_b_seq], axis=-1)  # (B, K, W, T, 2)
    return sigma, r_new


def ctc_init_state(x: jnp.ndarray, blank_id: int = 0):
    """State/score of the empty prefix: all-blank paths.

    Returns (r0 (B, T, 2), sigma0 (B,))."""
    xb = x[:, :, blank_id]
    r_b = jnp.cumsum(xb, axis=-1)
    r_nb = jnp.full_like(r_b, NEG_INF)
    return jnp.stack([r_nb, r_b], axis=-1), r_b[:, -1]


class BeamResult(NamedTuple):
    tokens: jnp.ndarray  # (B, K, L) best-first hypotheses (sos stripped)
    lengths: jnp.ndarray  # (B, K) token counts (pre-eos)
    scores: jnp.ndarray  # (B, K)


def beam_search(
    decode_fn: Optional[Callable],  # (ys (N, L+1), step) -> next logp (N, V)
    batch: int,
    beam: int,
    vocab: int,
    sos: int,
    eos: int,
    maxlen: int,
    ctc_logp: Optional[jnp.ndarray] = None,  # (B, T, V) pre-masked
    ctc_weight: float = 0.0,
    length_bonus: float = 0.0,
    pre_beam: Optional[int] = None,
    blank_id: int = 0,
    lm_fn: Optional[Callable] = None,  # (ys (N,L+1), step) -> (N, V) logp
    lm_weight: float = 0.0,
    hotword_tables=None,  # (next_state (S,V), bonus (S,V)) from build_bias_trie
    hotword_weight: float = 1.0,
    step_score_fn: Optional[Callable] = None,
    dec_state=None,
    state_reorder_fn: Optional[Callable] = None,
    lm_step_fn: Optional[Callable] = None,
    lm_state=None,
    lm_reorder_fn: Optional[Callable] = None,
    cache_stages=None,  # increasing step bounds, e.g. (24, 48, 72, 96)
    state_grow_fn: Optional[Callable] = None,  # (state, new_len) -> state
    lm_state_grow_fn: Optional[Callable] = None,
) -> BeamResult:
    """Batched fixed-beam search; jit-compatible (static maxlen/beam).

    Two attention-scorer interfaces:

    - ``decode_fn(ys, step)``: full-prefix rescoring each step (simple,
      L^2 recompute);
    - ``step_score_fn(last_tok (N,), step, state) -> (logp (N, V), state)``
      with ``dec_state`` the initial cache pytree and
      ``state_reorder_fn(state, src_flat (N,))`` the beam-gather — the
      incremental cached path (reference transformer/decoder.py:291
      ``forward_one_step`` semantics; see ops/cached_decoder.py).

    The LM shallow-fusion term mirrors the same pair: ``lm_fn(ys, step)``
    full-prefix, or ``lm_step_fn``/``lm_state``/``lm_reorder_fn`` cached
    (ops/cached_decoder.CachedTransformerLM).

    The decode loop is a ``lax.while_loop`` that exits as soon as every
    hypothesis has emitted eos (the reference's ``end_detect``), which the
    fixed-trip scan it replaced could not.

    ``cache_stages`` (incremental path only, with ``state_grow_fn``) runs
    the decode as consecutive while_loops with the cache buffer resized to
    each stage's step bound: the cached step is KV-cache-bandwidth-bound
    (docs/ROOFLINE.md r5 — per-step reorder + attention traffic scales
    with the buffer length M), and a fixed maxlen-sized buffer pays full-M
    traffic from step 0.  Staging cuts the mean M roughly in half with
    EXACT numerics (masked rows contribute exact zeros either way); the
    early-exit check runs per stage as before.
    """
    B, K, V = batch, beam, vocab
    incremental = step_score_fn is not None
    if not incremental and decode_fn is None:
        raise ValueError("need decode_fn or step_score_fn")
    if incremental and state_reorder_fn is None:
        raise ValueError("step_score_fn requires state_reorder_fn")
    lm_incremental = lm_step_fn is not None
    if lm_incremental and lm_reorder_fn is None:
        raise ValueError("lm_step_fn requires lm_reorder_fn")
    use_ctc = ctc_logp is not None and ctc_weight > 0.0
    use_hw = hotword_tables is not None and hotword_weight != 0.0
    if use_hw:
        hw_next = jnp.asarray(hotword_tables[0], jnp.int32)
        hw_bonus = jnp.asarray(hotword_tables[1], jnp.float32)
    W = pre_beam or min(int(1.5 * K) + 1, V)

    ys = jnp.full((B, K, maxlen + 1), eos, jnp.int32).at[:, :, 0].set(sos)
    scores = jnp.full((B, K), NEG_INF).at[:, 0].set(0.0)
    finished = jnp.zeros((B, K), bool)
    lengths = jnp.zeros((B, K), jnp.int32)
    hw_state = jnp.zeros((B, K), jnp.int32)
    if use_ctc:
        T = ctc_logp.shape[1]
        r0, sigma0 = ctc_init_state(ctc_logp, blank_id)
        r_state = jnp.broadcast_to(r0[:, None], (B, K, T, 2))
        sigma_g = jnp.broadcast_to(sigma0[:, None], (B, K))
        # time-minor layout for the per-step candidate row gathers
        ctc_logp_t = jnp.swapaxes(ctc_logp, 1, 2)
    else:
        r_state = jnp.zeros((B, K, 1, 2))
        sigma_g = jnp.zeros((B, K))

    def step_fn(carry, step):
        (ys, scores, finished, lengths, r_state, sigma_g, hw_state,
         dstate, lstate) = carry
        N = B * K
        last = jnp.take_along_axis(
            ys, jnp.broadcast_to(step[None, None, None], (B, K, 1)), axis=2
        )[..., 0]  # (B, K) token at position `step`
        if incremental:
            logp, dstate = step_score_fn(last.reshape(N), step, dstate)
        else:
            logp = decode_fn(ys.reshape(N, -1), step)  # (N, V)
        logp = logp.reshape(B, K, V).astype(jnp.float32)

        if use_ctc:
            att_w = 1.0 - ctc_weight
        else:
            att_w = 1.0
        lm_term = 0.0
        if lm_incremental and lm_weight != 0.0:
            lm_logp, lstate = lm_step_fn(last.reshape(N), step, lstate)
            lm_term = lm_weight * lm_logp.reshape(B, K, V).astype(jnp.float32)
        elif lm_fn is not None and lm_weight != 0.0:
            lm_logp = lm_fn(ys.reshape(N, -1), step).reshape(B, K, V)
            lm_term = lm_weight * lm_logp.astype(jnp.float32)

        if use_ctc:
            # pre-beam candidates selected by the fused att(+lm) score;
            # top_k returns the candidate scores directly (the old
            # take_along_axis over the vocab lanes re-gathered them)
            fused = att_w * logp + lm_term
            # top_k on the 2-D reshape: the 3-D (B, K, V) form lowers ~7x
            # slower on TPU (0.64 vs 0.088 ms/step at bench shapes — it
            # was the beam's hidden CTC-path cost, r5 profile).
            # FUNASR_TPU_APPROX_PREBEAM=1 swaps in approx_max_k for the
            # pre-beam candidate pick (espnet's pre-beam is itself a
            # pruning heuristic; the approximate variant's recall target
            # is 0.95 per missing bucket — measured ~3x faster at W=16).
            import os as _os

            if _os.environ.get("FUNASR_TPU_APPROX_PREBEAM") == "1":
                cf2, c2 = lax.approx_max_k(fused.reshape(B * K, V), W)
            else:
                cf2, c2 = lax.top_k(fused.reshape(B * K, V), W)
            cand_fused = cf2.reshape(B, K, W)
            cand = c2.reshape(B, K, W)
            pe = jnp.broadcast_to(step == 0, (B, K))
            sigma, r_new = ctc_prefix_step(
                ctc_logp_t, r_state, last, cand, pe, blank_id
            )
            # eos is "prefix complete", not a CTC symbol: its score is the
            # full-utterance CTC probability of the prefix itself
            # (reference scorers/ctc_prefix_score.py:169
            # ``log_psi[:, eos] = r_sum[-1]``)
            prefix_complete = _logaddexp(r_state[..., -1, 0],
                                         r_state[..., -1, 1])  # (B, K)
            sigma = jnp.where(cand == eos, prefix_complete[:, :, None], sigma)
            combined = (cand_fused
                        + ctc_weight * (sigma - sigma_g[:, :, None])
                        + length_bonus)
            if use_hw:
                combined = combined + hotword_weight * jax.vmap(
                    jax.vmap(lambda s, c: hw_bonus[s][c]))(hw_state, cand)
            # CANDIDATE-SPACE selection: every non-candidate extension is
            # NEG_INF by construction (pre-beam pruning), so the final
            # top-k runs over the (B, K*(W+1)) candidate scores directly
            # instead of scattering them into a (B, K, V) grid and
            # top-k'ing K*V lanes — exact same hypothesis set, ~250x
            # smaller selection problem.  Column W is the forced eos
            # extension of FINISHED hyps (zero cost, reference
            # end-detect semantics); for running hyps eos is only
            # reachable as a regular pre-beam candidate, as before.
            Wc = W + 1
            ext = jnp.where(finished[:, :, None], NEG_INF, combined)
            eos_col = jnp.where(finished, 0.0, NEG_INF)[:, :, None]
            ext = jnp.concatenate([ext, eos_col], axis=2)  # (B, K, W+1)
            total = scores[:, :, None] + ext
            top_scores, top_idx = lax.top_k(total.reshape(B, K * Wc), K)
            src_hyp = top_idx // Wc  # (B, K)
            w_idx = top_idx % Wc
            w_sel = jnp.minimum(w_idx, W - 1)
            cand_src = jnp.take_along_axis(
                cand, src_hyp[:, :, None], axis=1)  # (B, K, W) of src rows
            tok = jnp.where(
                w_idx == W, eos,
                jax.vmap(jax.vmap(lambda c, w: c[w]))(cand_src, w_sel))
        else:
            total_ext = logp + lm_term + length_bonus
            if use_hw:
                total_ext = total_ext + hotword_weight * hw_bonus[hw_state]
            # finished hyps may only extend with eos at zero cost
            eos_only = jnp.full((V,), NEG_INF).at[eos].set(0.0)
            total_ext = jnp.where(finished[:, :, None], eos_only[None, None],
                                  total_ext)
            total = scores[:, :, None] + total_ext  # (B, K, V)

            flat = total.reshape(B, K * V)
            top_scores, top_idx = lax.top_k(flat, K)  # (B, K)
            src_hyp = top_idx // V  # (B, K)
            tok = top_idx % V

        def gather_hyp(x):
            return jnp.take_along_axis(
                x, src_hyp.reshape(B, K, *([1] * (x.ndim - 2))), axis=1
            )

        ys = gather_hyp(ys)
        if incremental or lm_incremental:
            src_flat = (jnp.arange(B, dtype=src_hyp.dtype)[:, None] * K
                        + src_hyp).reshape(B * K)
            if incremental:
                dstate = state_reorder_fn(dstate, src_flat)
            if lm_incremental:
                lstate = lm_reorder_fn(lstate, src_flat)
        finished = jnp.take_along_axis(finished, src_hyp, axis=1)
        lengths = jnp.take_along_axis(lengths, src_hyp, axis=1)
        ys = ys.at[:, :, step + 1].set(jnp.where(finished, eos, tok))
        newly_finished = (tok == eos) & ~finished
        lengths = jnp.where(finished | newly_finished, lengths, lengths + 1)

        if use_ctc:
            r_state_g = gather_hyp(r_state)
            sigma_g2 = jnp.take_along_axis(sigma_g, src_hyp, axis=1)
            r_new_g = gather_hyp(r_new)
            sig_new_g = jnp.take_along_axis(sigma, src_hyp[..., None], axis=1)
            # the chosen candidate column comes straight from the
            # candidate-space top-k (w_idx); column W = forced eos
            took_cand = (w_idx < W) & ~finished & (tok != eos)
            r_sel = jax.vmap(jax.vmap(lambda r, i: r[i]))(r_new_g, w_sel)
            sig_sel = jax.vmap(jax.vmap(lambda s, i: s[i]))(sig_new_g, w_sel)
            r_state = jnp.where(took_cand[:, :, None, None], r_sel, r_state_g)
            sigma_g = jnp.where(took_cand, sig_sel, sigma_g2)

        if use_hw:
            hw_g = jnp.take_along_axis(hw_state, src_hyp, axis=1)
            hw_adv = jax.vmap(jax.vmap(lambda s, t: hw_next[s, t]))(hw_g, tok)
            hw_state = jnp.where(finished | (tok == eos), hw_g, hw_adv)

        finished = finished | (tok == eos)
        scores = top_scores
        return (ys, scores, finished, lengths, r_state, sigma_g, hw_state,
                dstate, lstate)

    if incremental and cache_stages and state_grow_fn is not None:
        bounds = sorted({int(b) for b in cache_stages if 0 < b < maxlen})
        bounds.append(maxlen)
    else:
        bounds = [maxlen]

    def loop_body(sc):
        step, carry = sc
        return step + 1, step_fn(carry, step)

    step = jnp.asarray(0, jnp.int32)
    for hi in bounds:
        if len(bounds) > 1:
            dec_state = state_grow_fn(dec_state, hi)
            if lm_incremental and lm_state_grow_fn is not None:
                lm_state = lm_state_grow_fn(lm_state, hi)
        carry = (ys, scores, finished, lengths, r_state, sigma_g, hw_state,
                 dec_state, lm_state)

        def loop_cond(sc, _hi=hi):
            step, carry = sc
            return (step < _hi) & ~jnp.all(carry[2])

        step, carry = lax.while_loop(loop_cond, loop_body, (step, carry))
        (ys, scores, finished, lengths, r_state, sigma_g, hw_state,
         dec_state, lm_state) = carry
    if len(bounds) > 1:
        # the forced-eos rescore below writes at position maxlen
        dec_state = state_grow_fn(dec_state, maxlen + 1)
        if lm_incremental and lm_state_grow_fn is not None:
            lm_state = lm_state_grow_fn(lm_state, maxlen + 1)

    # forced-eos finalization: hypotheses still running at maxlen must pay
    # the eos term before ranking against finished ones (the reference
    # appends eos to every running hyp in the final loop), otherwise an
    # unfinished hyp that banked maxlen token logps outranks a correctly
    # terminated one.
    if incremental:
        final_logp, _ = step_score_fn(ys[:, :, maxlen].reshape(B * K),
                                      jnp.asarray(maxlen), dec_state)
    else:
        final_logp = decode_fn(ys.reshape(B * K, -1), jnp.asarray(maxlen))
    final_eos = final_logp.reshape(B, K, V)[..., eos].astype(jnp.float32)
    att_w_final = 1.0 - ctc_weight if use_ctc else 1.0
    eos_term = att_w_final * final_eos + length_bonus
    if lm_incremental and lm_weight != 0.0:
        lm_eos, _ = lm_step_fn(ys[:, :, maxlen].reshape(B * K),
                               jnp.asarray(maxlen), lm_state)
        eos_term = eos_term + lm_weight * (
            lm_eos.reshape(B, K, V)[..., eos].astype(jnp.float32))
    elif lm_fn is not None and lm_weight != 0.0:
        lm_eos = lm_fn(ys.reshape(B * K, -1), jnp.asarray(maxlen))
        eos_term = eos_term + lm_weight * (
            lm_eos.reshape(B, K, V)[..., eos].astype(jnp.float32))
    if use_ctc:
        prefix_complete = _logaddexp(r_state[..., -1, 0], r_state[..., -1, 1])
        eos_term = eos_term + ctc_weight * (prefix_complete - sigma_g)
    if use_hw:
        # cancel uncommitted trie credit for hyps still mid-hotword, just
        # as an in-loop eos step would have (hw_bonus[state][eos] is the
        # partial-match back-off)
        eos_term = eos_term + hotword_weight * hw_bonus[hw_state][..., eos]
    scores = jnp.where(finished, scores, scores + eos_term)

    order = jnp.argsort(-scores, axis=1)
    ys = jnp.take_along_axis(ys, order[:, :, None], axis=1)
    scores = jnp.take_along_axis(scores, order, axis=1)
    lengths = jnp.take_along_axis(lengths, order, axis=1)
    return BeamResult(ys[:, :, 1:], lengths, scores)

"""Incremental (KV-cached) per-step scoring for the AR TransformerDecoder.

The reference's AR decoders score beam steps incrementally with a growing
cache (funasr/models/transformer/decoder.py:291 ``forward_one_step``, :334
``batch_score``); the repo's tensor beam used to re-run the FULL prefix
decoder every step instead (L^2 recompute — measured as the decoder share
of the hybrid-beam cost).  This module is the TPU-native equivalent of the
reference cache: self-attention K/V of past positions live in fixed-size
device buffers indexed by the step counter, and cross-attention K/V of the
encoder memory are projected once per utterance.

Pure functions over the decoder's param tree (the nn.scan-stacked params of
models/transformer/decoder.TransformerDecoder) so each beam step is ONE
``lax.scan`` over layers on a single-token query — no flax lifting in the
decode hot loop.  The math mirrors the module line for line (same dtype
casts: bf16 matmuls, fp32 layernorm/softmax, QDense-switchable int8
contraction); exact parity with the full recompute is pinned by
tests/test_beam_search.py.

Beam reordering: the per-layer K/V buffers are the only step-dependent
state; ``reorder_state`` gathers them along the hypothesis axis with the
flat source indices the beam emits (the cache-pytree gather the reference
does with ``batch_beam_search``'s index_select).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from funasr_tpu.ops.quant import maybe_int8_dot_general


def _dense(x, p, dtype):
    """nn.Dense with the switchable int8 contraction (= ops.quant.QDense)."""
    k = p["kernel"].astype(dtype)
    y = maybe_int8_dot_general(
        x.astype(dtype), k, (((x.ndim - 1,), (0,)), ((), ())))
    if "bias" in p:
        y = y + p["bias"].astype(dtype)
    return y


def _ln(x, p, eps=1e-12):
    """models.sanm.ln_f32 on raw weights (fp32 stats, torch eps)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * lax.rsqrt(var + eps)
    return y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)


def _heads(x, n_head):
    N, T, F = x.shape
    d_k = F // n_head
    return x.reshape(N, T, n_head, d_k).transpose(0, 2, 1, 3)


def _mha_step(q, k, v, key_valid, n_head, dtype):
    """Single-query attention over cached keys.

    q (N, 1, F); k, v (N, M, F); key_valid (N, M) bool.  Score matmul in
    ``dtype`` (bf16 on the serving path), softmax fp32 — matching
    models.transformer.decoder.MultiHeadAttention / sanm.masked_softmax.
    """
    N, _, F = q.shape
    d_k = F // n_head
    qh = _heads(q, n_head) * (d_k ** -0.5)          # (N, H, 1, d_k)
    kh = _heads(k, n_head)                          # (N, H, M, d_k)
    vh = _heads(v, n_head)
    scores = jnp.einsum("nhqd,nhkd->nhqk", qh.astype(dtype),
                        kh.astype(dtype))           # (N, H, 1, M)
    scores = scores.astype(jnp.float32)
    scores = jnp.where(key_valid[:, None, None, :], scores, -jnp.inf)
    attn = jax.nn.softmax(scores, axis=-1)
    attn = jnp.where(key_valid[:, None, None, :], attn, 0.0)
    ctx = jnp.einsum("nhqk,nhkd->nhqd", attn.astype(vh.dtype), vh)
    return ctx.transpose(0, 2, 1, 3).reshape(N, 1, F)


def _mha_step_int8(q, k8, ks, v8, vs, key_valid, n_head, dtype):
    """Single-query attention over a per-row int8 KV cache.

    Same math as dequantize-then-``_mha_step``, but the row scales are
    applied to the SCORES (k) and the attention WEIGHTS (v) instead of
    materialising dequantized (N, M, F) buffers:
    ``q·(k8*ks) == (q·k8)*ks`` and ``sum_m a_m*(v8_m*vs_m) ==
    sum_m (a_m*vs_m)*v8_m`` row-exactly — leaving pure int8->compute
    converts on the cache reads, which XLA fuses into the dot operands
    (the dequant multiply forced a separate full-width materialisation).
    """
    N, _, F = q.shape
    d_k = F // n_head
    qh = _heads(q, n_head) * (d_k ** -0.5)          # (N, H, 1, d_k)
    kh = _heads(k8.astype(dtype), n_head)           # (N, H, M, d_k)
    vh = _heads(v8.astype(dtype), n_head)
    scores = jnp.einsum("nhqd,nhkd->nhqk", qh.astype(dtype), kh)
    scores = scores.astype(jnp.float32) * ks[:, None, None, :]
    scores = jnp.where(key_valid[:, None, None, :], scores, -jnp.inf)
    attn = jax.nn.softmax(scores, axis=-1)
    attn = jnp.where(key_valid[:, None, None, :], attn, 0.0)
    attn = attn * vs[:, None, None, :]
    ctx = jnp.einsum("nhqk,nhkd->nhqd", attn.astype(vh.dtype), vh)
    return ctx.transpose(0, 2, 1, 3).reshape(N, 1, F)


def _mha_step_shared_int8(q, k8, ks, v8, vs, key_valid, n_head, beam, dtype):
    """Beam-shared cross-attention over per-row int8 encoder K/V.

    Same scale placement as ``_mha_step_int8`` (k scales on the scores,
    v scales on the attention weights — row-exact): q (B*beam, 1, F)
    against k8/v8 (B, T, F) int8 with ks/vs (B, T) fp32 row scales.
    Halves the dominant cross-attention HBM stream vs the bf16 K/V.
    """
    N, _, F = q.shape
    B = N // beam
    d_k = F // n_head
    qh = (q.reshape(B, beam, n_head, d_k)
          .transpose(0, 2, 1, 3)) * (d_k ** -0.5)     # (B, H, beam, d_k)
    kh = _heads(k8.astype(dtype), n_head)             # (B, H, T, d_k)
    vh = _heads(v8.astype(dtype), n_head)
    scores = jnp.einsum("bhkd,bhtd->bhkt", qh.astype(dtype), kh)
    scores = scores.astype(jnp.float32) * ks[:, None, None, :]
    scores = jnp.where(key_valid[:, None, None, :], scores, -jnp.inf)
    attn = jax.nn.softmax(scores, axis=-1)
    attn = jnp.where(key_valid[:, None, None, :], attn, 0.0)
    attn = attn * vs[:, None, None, :]
    ctx = jnp.einsum("bhkt,bhtd->bhkd", attn.astype(vh.dtype), vh)
    return ctx.transpose(0, 2, 1, 3).reshape(N, 1, F)


def _mha_step_shared(q, k, v, key_valid, n_head, beam, dtype):
    """Single-query attention with BEAM-SHARED keys/values.

    Every beam row of one utterance attends the same encoder memory, so
    cross K/V are projected and stored once per utterance: q (B*beam, 1, F)
    against k, v (B, T, F), key_valid (B, T).  Cuts the dominant per-step
    HBM stream (the K/V read) by the beam factor vs materialising
    (B*beam, T, F) — measured as the main cost of the cached beam step.
    """
    N, _, F = q.shape
    B = N // beam
    T = k.shape[1]
    d_k = F // n_head
    qh = (q.reshape(B, beam, n_head, d_k)
          .transpose(0, 2, 1, 3)) * (d_k ** -0.5)    # (B, H, beam, d_k)
    kh = _heads(k, n_head)                           # (B, H, T, d_k)
    vh = _heads(v, n_head)
    scores = jnp.einsum("bhkd,bhtd->bhkt", qh.astype(dtype),
                        kh.astype(dtype))            # (B, H, beam, T)
    scores = scores.astype(jnp.float32)
    scores = jnp.where(key_valid[:, None, None, :], scores, -jnp.inf)
    attn = jax.nn.softmax(scores, axis=-1)
    attn = jnp.where(key_valid[:, None, None, :], attn, 0.0)
    ctx = jnp.einsum("bhkt,bhtd->bhkd", attn.astype(vh.dtype), vh)
    return ctx.transpose(0, 2, 1, 3).reshape(N, 1, F)


class DecoderState(NamedTuple):
    """Per-hypothesis cache: projected self-attn K/V, layer-stacked.

    With the int8 cache (``FUNASR_TPU_INT8_KV=1``) ``k``/``v`` hold int8
    codes and ``k_scale``/``v_scale`` the per-(layer, row, position)
    dequant scales; otherwise scales are unused zero-size arrays."""

    k: jnp.ndarray  # (L, N, M, F) compute-dtype or int8
    v: jnp.ndarray  # (L, N, M, F)
    # None outside int8 mode (NOT a zero-size array: a module-level
    # jnp default would initialize the backend at import time, before
    # the CLI's JAX_PLATFORMS handling)
    k_scale: Optional[jnp.ndarray] = None  # (L, N, M) fp32 (int8 mode)
    v_scale: Optional[jnp.ndarray] = None


def _q8_rows(x):
    """Per-row symmetric int8: x (N, 1, F) -> (codes int8, scale fp32
    (N, 1))."""
    a = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(a, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]),
                 -127, 127).astype(jnp.int8)
    return q, scale


def int8_kv_enabled() -> bool:
    """Opt-in int8 self-attention KV cache for the AR beam: halves the
    per-step HBM stream the step is bound by (reorder gather + attention
    read of the (L, N, M, F) buffers).  Changes scores by the per-row
    int8 rounding (~0.4% relative), so it is a SEPARATE knob from the
    serving matmul int8 flag — the cached-vs-full beam parity contract
    holds with it off (default)."""
    import os

    return os.environ.get("FUNASR_TPU_INT8_KV", "") == "1"


def resize_state(state: DecoderState, new_len: int) -> DecoderState:
    """Resize the cache position axis to exactly ``new_len`` rows.

    Zero-pads (growth) or truncates (shrink); the beam's staged cache
    growth only ever truncates UNWRITTEN rows (stage bounds are >= the
    step counter), so this is value-preserving for every live position.
    Identity when the length already matches, so it is safe to call
    unconditionally at stage boundaries.
    """
    cur = state.k.shape[2]
    if cur == new_len:
        return state

    def rs(x, pad_shape):
        if cur < new_len:
            pad = jnp.zeros(pad_shape, x.dtype)
            return jnp.concatenate([x, pad], axis=2)
        return x[:, :, :new_len]

    L, N = state.k.shape[:2]
    F = state.k.shape[3]
    k = rs(state.k, (L, N, new_len - cur, F))
    v = rs(state.v, (L, N, new_len - cur, F))
    if state.k_scale is not None:
        ks = rs(state.k_scale, (L, N, new_len - cur))
        vs = rs(state.v_scale, (L, N, new_len - cur))
        return DecoderState(k=k, v=v, k_scale=ks, v_scale=vs)
    return DecoderState(k=k, v=v)


class CachedTransformerDecoder:
    """Step scorer over a TransformerDecoder param tree.

    Parameters live outside (functional); an instance only holds the
    static configuration + per-utterance precomputed tensors.
    """

    def __init__(self, dec_params, memory, memory_lengths, *, n_head,
                 maxlen, dtype=jnp.float32, beam=1, int8_kv=None):
        """memory (B, T, D) is per UTTERANCE (un-repeated); ``beam`` makes
        the hypothesis axis N = B*beam for the self-KV caches while cross
        K/V stay beam-shared (see ``_mha_step_shared``).  ``int8_kv``
        (default: the FUNASR_TPU_INT8_KV env flag) stores the self-attn
        cache as per-row int8 — see ``int8_kv_enabled``."""
        self.p = dec_params
        self.n_head = n_head
        self.maxlen = maxlen
        self.dtype = dtype
        self.beam = beam
        self.int8_kv = int8_kv_enabled() if int8_kv is None else int8_kv
        B, T, _ = memory.shape
        N = B * beam
        self.N = N
        F = dec_params["decoders"]["self_attn"]["linear_q"]["kernel"].shape[-1]
        self.F = F
        self.L = dec_params["decoders"]["self_attn"]["linear_q"][
            "kernel"].shape[0]
        d = dec_params["embed"]["embedding"].shape[-1]
        self.d = d
        # cross-attention K/V projected once per UTTERANCE (the reference
        # recomputes them every forward_one_step; here they are loop
        # invariants hoisted out of the beam scan, shared across beam rows)
        mem = memory.astype(dtype)
        self.ck = jax.vmap(
            lambda p: _dense(mem, p, dtype))(dec_params["decoders"]
                                             ["src_attn"]["linear_k"])
        self.cv = jax.vmap(
            lambda p: _dense(mem, p, dtype))(dec_params["decoders"]
                                             ["src_attn"]["linear_v"])
        if self.int8_kv:
            # per-row int8 cross K/V, quantized ONCE per utterance (the
            # per-step read of the (L, B, T, F) encoder projections is the
            # other big per-step HBM stream after the self-attn cache)
            self.ck, self.cks = _q8_rows(self.ck)
            self.cv, self.cvs = _q8_rows(self.cv)
        self.mem_valid = (jnp.arange(T)[None, :]
                          < memory_lengths[:, None])  # (B, T)
        sa = dec_params["decoders"]["self_attn"]
        self.wqkv = jnp.concatenate(
            [sa["linear_q"]["kernel"], sa["linear_k"]["kernel"],
             sa["linear_v"]["kernel"]], axis=2).astype(dtype)  # (L, D, 3F)
        self.bqkv = jnp.concatenate(
            [sa["linear_q"]["bias"], sa["linear_k"]["bias"],
             sa["linear_v"]["bias"]], axis=1).astype(dtype)  # (L, 3F)
        from funasr_tpu.ops.posenc import transformer_encoding

        self.pe = transformer_encoding(maxlen + 1, d)

    def _cache_len(self) -> int:
        # exact maxlen+1: a 128-aligned buffer was A/B'd on the real chip
        # and LOST (B=8 att phase 40.6 -> 51.6 ms) — the step is KV-cache
        # bandwidth-bound, so buffer bytes beat tile alignment
        return self.maxlen + 1

    def init_state(self, cache_len: Optional[int] = None) -> DecoderState:
        shape = (self.L, self.N,
                 self._cache_len() if cache_len is None else cache_len,
                 self.F)
        if self.int8_kv:
            z = jnp.zeros(shape, jnp.int8)
            sc = jnp.zeros(shape[:3], jnp.float32)
            return DecoderState(k=z, v=z, k_scale=sc, v_scale=sc)
        z = jnp.zeros(shape, self.dtype)
        return DecoderState(k=z, v=z)

    def step(self, y_tok: jnp.ndarray, pos, state: DecoderState
             ) -> Tuple[jnp.ndarray, DecoderState]:
        """Score the next token after prefix position ``pos``.

        y_tok (N,) int32 token at position ``pos`` (sos for pos 0);
        returns (log-probs (N, V) fp32, updated state).
        """
        p, dtype = self.p, self.dtype
        # the live buffer length comes from the STATE, not the config:
        # the beam's staged cache growth (ops/beam_search.py
        # ``cache_stages``) runs early decode segments on shorter buffers
        # — the step is KV-bandwidth-bound, so reorder+attention traffic
        # scales with M
        M = state.k.shape[2]
        emb = p["embed"]["embedding"][y_tok].astype(dtype)  # (N, d)
        x = emb * (self.d ** 0.5) + lax.dynamic_slice_in_dim(
            self.pe, pos, 1, axis=0).astype(dtype)
        x = x[:, None, :]  # (N, 1, d)
        kv_valid = (jnp.arange(M)[None, :] <= pos)  # (1, M)
        kv_valid = jnp.broadcast_to(kv_valid, (self.N, M))

        def layer(x, xs):
            if self.int8_kv:
                (lp, wqkv, bqkv, ck_l, cv_l, cks_l, cvs_l, k_l, v_l,
                 ks_l, vs_l) = xs
            else:
                lp, wqkv, bqkv, ck_l, cv_l, k_l, v_l = xs
            h = _ln(x, lp["norm1"]).astype(dtype)
            # fused QKV: one (D, 3F) matmul instead of three — per-step
            # cost here is kernel-dispatch-bound, not FLOP-bound; the
            # fused weights are precomputed per utterance batch (init)
            qkv = maybe_int8_dot_general(
                h.astype(dtype), wqkv, (((2,), (0,)), ((), ()))) + bqkv
            qs, ks, vs = jnp.split(qkv, 3, axis=-1)
            if self.int8_kv:
                kq, ksc = _q8_rows(ks)
                vq, vsc = _q8_rows(vs)
                k_l = lax.dynamic_update_slice_in_dim(k_l, kq, pos, axis=1)
                v_l = lax.dynamic_update_slice_in_dim(v_l, vq, pos, axis=1)
                ks_l = lax.dynamic_update_slice_in_dim(ks_l, ksc, pos,
                                                       axis=1)
                vs_l = lax.dynamic_update_slice_in_dim(vs_l, vsc, pos,
                                                       axis=1)
                ctx = _mha_step_int8(qs, k_l, ks_l, v_l, vs_l, kv_valid,
                                     self.n_head, dtype)
            else:
                k_l = lax.dynamic_update_slice_in_dim(k_l, ks, pos, axis=1)
                v_l = lax.dynamic_update_slice_in_dim(v_l, vs, pos, axis=1)
                ctx = _mha_step(qs, k_l, v_l, kv_valid, self.n_head, dtype)
            x = x + _dense(ctx, lp["self_attn"]["linear_out"], dtype)
            h = _ln(x, lp["norm2"]).astype(dtype)
            q2 = _dense(h, lp["src_attn"]["linear_q"], dtype)
            if self.int8_kv:
                ctx2 = _mha_step_shared_int8(
                    q2, ck_l, cks_l, cv_l, cvs_l, self.mem_valid,
                    self.n_head, self.beam, dtype)
            else:
                ctx2 = _mha_step_shared(q2, ck_l, cv_l, self.mem_valid,
                                        self.n_head, self.beam, dtype)
            x = x + _dense(ctx2, lp["src_attn"]["linear_out"], dtype)
            h = _ln(x, lp["norm3"]).astype(dtype)
            h = _dense(h, lp["feed_forward"]["w_1"], dtype)
            h = jax.nn.relu(h)
            h = _dense(h, lp["feed_forward"]["w_2"], dtype)
            if self.int8_kv:
                return x + h, (k_l, v_l, ks_l, vs_l)
            return x + h, (k_l, v_l)

        # unroll: the per-layer step is ~10 tiny ops; inlining all layers
        # lets XLA fuse across them (the beam step is dispatch-bound,
        # docs/ROOFLINE.md r4 section)
        if self.int8_kv:
            x, outs = lax.scan(
                layer, x,
                (p["decoders"], self.wqkv, self.bqkv, self.ck, self.cv,
                 self.cks, self.cvs,
                 state.k, state.v, state.k_scale, state.v_scale),
                unroll=True)
            k_new, v_new, ks_new, vs_new = outs
            new_state = DecoderState(k=k_new, v=v_new, k_scale=ks_new,
                                     v_scale=vs_new)
        else:
            x, (k_new, v_new) = lax.scan(
                layer, x, (p["decoders"], self.wqkv, self.bqkv,
                           self.ck, self.cv, state.k, state.v),
                unroll=True)
            new_state = DecoderState(k=k_new, v=v_new)
        x = _ln(x, p["after_norm"]).astype(dtype)
        logits = _dense(x, p["output_layer"], dtype)[:, 0]  # (N, V)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return logp, new_state

    @staticmethod
    def reorder_state(state: DecoderState, src_flat: jnp.ndarray
                      ) -> DecoderState:
        """Gather the cache along the hypothesis axis (N,) after top-k."""
        if state.k_scale is not None:
            return DecoderState(k=state.k[:, src_flat],
                                v=state.v[:, src_flat],
                                k_scale=state.k_scale[:, src_flat],
                                v_scale=state.v_scale[:, src_flat])
        return DecoderState(k=state.k[:, src_flat], v=state.v[:, src_flat])


class CachedTransformerLM:
    """Step scorer over a TransformerLM param tree for beam shallow fusion
    (reference transformer_lm.py scored through espnet's ``batch_score``
    cache; here the same KV-cache treatment as the decoder scorer so the
    LM term stops re-running the full prefix every step).

    ``n_hyps`` is the flat hypothesis count (B*beam); there is no
    cross-attention so the whole state is the self-KV cache.
    """

    def __init__(self, lm_params, n_hyps: int, *, n_head, maxlen,
                 dtype=jnp.float32):
        from funasr_tpu.ops.posenc import transformer_encoding

        self.p = lm_params
        self.n_head = n_head
        self.maxlen = maxlen
        self.dtype = dtype
        self.N = n_hyps
        self.F = lm_params["encoders"]["self_attn"]["linear_q"][
            "kernel"].shape[-1]
        self.L = lm_params["encoders"]["self_attn"]["linear_q"][
            "kernel"].shape[0]
        self.att = lm_params["after_norm"]["scale"].shape[-1]
        sa = lm_params["encoders"]["self_attn"]
        self.wqkv = jnp.concatenate(
            [sa["linear_q"]["kernel"], sa["linear_k"]["kernel"],
             sa["linear_v"]["kernel"]], axis=2).astype(dtype)
        self.bqkv = jnp.concatenate(
            [sa["linear_q"]["bias"], sa["linear_k"]["bias"],
             sa["linear_v"]["bias"]], axis=1).astype(dtype)
        self.pe = transformer_encoding(maxlen + 1, self.att)

    def _cache_len(self) -> int:
        return self.maxlen + 1  # see CachedTransformerDecoder._cache_len

    def init_state(self) -> DecoderState:
        z = jnp.zeros((self.L, self.N, self._cache_len(), self.F),
                      self.dtype)
        return DecoderState(k=z, v=z)

    def step(self, y_tok: jnp.ndarray, pos, state: DecoderState):
        p, dtype = self.p, self.dtype
        M = state.k.shape[2]  # staged cache growth — see the decoder step
        emb = p["embed"]["embedding"][y_tok].astype(dtype)
        x = _dense(emb, p["input_layer"], dtype)
        x = x * (self.att ** 0.5) + lax.dynamic_slice_in_dim(
            self.pe, pos, 1, axis=0).astype(dtype)
        x = x[:, None, :]
        kv_valid = jnp.broadcast_to(
            jnp.arange(M)[None, :] <= pos, (self.N, M))

        def layer(x, xs):
            lp, wqkv, bqkv, k_l, v_l = xs
            h = _ln(x, lp["norm1"]).astype(dtype)
            qkv = maybe_int8_dot_general(
                h.astype(dtype), wqkv, (((2,), (0,)), ((), ()))) + bqkv
            qs, ks, vs = jnp.split(qkv, 3, axis=-1)
            k_l = lax.dynamic_update_slice_in_dim(k_l, ks, pos, axis=1)
            v_l = lax.dynamic_update_slice_in_dim(v_l, vs, pos, axis=1)
            ctx = _mha_step(qs, k_l, v_l, kv_valid, self.n_head, dtype)
            x = x + _dense(ctx, lp["self_attn"]["linear_out"], dtype)
            h = _ln(x, lp["norm2"]).astype(dtype)
            h = _dense(h, lp["feed_forward"]["w_1"], dtype)
            h = jax.nn.relu(h)
            h = _dense(h, lp["feed_forward"]["w_2"], dtype)
            return x + h, (k_l, v_l)

        x, (k_new, v_new) = lax.scan(
            layer, x, (p["encoders"], self.wqkv, self.bqkv,
                       state.k, state.v), unroll=True)
        x = _ln(x, p["after_norm"]).astype(dtype)
        logits = _dense(x, p["decoder"], dtype)[:, 0]
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return logp, DecoderState(k=k_new, v=v_new)

    reorder_state = staticmethod(CachedTransformerDecoder.reorder_state)

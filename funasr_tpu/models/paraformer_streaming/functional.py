"""Streaming Paraformer forward as pure functions over offline param trees.

Streaming needs explicit caches threaded through every layer (encoder KV,
FSMN tails, CIF integrate state) — the cleanest TPU formulation is pure
functions over the *same* parameter pytree the offline flax modules use
(paths like ``encoder/encoders/self_attn/linear_q_k_v/kernel`` with scanned
stacks carrying a leading layer axis), so one checkpoint serves both paths.

Chunk semantics mirror the reference (sanm/encoder.py:440 ``forward_chunk``,
sanm/attention.py:313 attention KV cache, paraformer/cif_predictor.py:255
online CIF, sanm/attention.py:499 decoder FSMN cache):

- window = [l+r cached feature frames, c new frames] for chunk_size (l,c,r),
- attention attends over [KV cache (look_back*c frames), window], the
  window's trailing ``r`` frames stay out of the cache (they recur next
  chunk),
- CIF fires inside window frames [l, l+c): the lookback is masked, the
  trailing r frames are next chunk's lookahead (kept on the final chunk,
  plus a zero-hidden tail pseudo-frame); integrate/frame state carries,
- decoder FSMN memory carries the token stream's (kernel-1)-entry tail
  across chunks with the reference's exact symmetric-first/causal-later
  alignment (see fsmn_stream).

Everything here is shape-static and jit-compiled once per (chunk_size,
batch) configuration.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax



# ------------------------------------------------------------ param helpers
def dense(p, x):
    y = x @ p["kernel"]
    if "bias" in p:
        y = y + p["bias"]
    return y


def layer_norm(p, x, eps=1e-12):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, -1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), -1, keepdims=True)
    y = (xf - mean) * lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def depthwise_conv(x, kernel, left: int, right: int):
    """x (B,T,D), kernel (K,1,D) (SPMD-safe grad, ops/dwconv.py)."""
    from funasr_tpu.ops.dwconv import depthwise_conv1d

    return depthwise_conv1d(x, kernel, left, right)


# ------------------------------------------------------------ encoder chunk
class EncChunkState(NamedTuple):
    kv: jnp.ndarray  # (L+1, B, C, 2D) cached [k|v] per layer (C = cache len)
    kv_valid: jnp.ndarray  # () int32 valid cache frames (same all layers)


def _enc_layer_chunk(lp, x, kv_cache, kv_valid, win_valid, *, n_head,
                     kernel_size, first: bool, keep: int):
    """One SANM layer on a window with attention KV cache.

    lp: this layer's param subtree; x: (B, W, D_in); kv_cache: (B, C, 2D).
    keep: number of leading window frames to push into the cache
    (reference attention.py:330 caches window[:-r] = l+c frames).
    win_valid: () int32 — window frames beyond this are final-chunk padding
    (the reference's final window is dynamically shorter; here the pad
    frames are masked out of attention instead).
    Returns (y (B,W,D), new_kv_cache).
    """
    B, W, _ = x.shape
    C = kv_cache.shape[1]
    h = layer_norm(lp["norm1"], x)
    ap = lp["self_attn"]
    qkv = dense(ap["linear_q_k_v"], h)
    D = qkv.shape[-1] // 3
    q, k, v = jnp.split(qkv, 3, axis=-1)
    d_k = D // n_head

    # FSMN memory over the window only (reference passes mask=None); pad
    # frames beyond win_valid are zeroed so they cannot leak into the conv
    # tails of real frames.  win_valid: () scalar or (B,) per-utterance.
    wv = jnp.reshape(jnp.asarray(win_valid), (-1, 1, 1))  # (1|B, 1, 1)
    wpos = lax.broadcasted_iota(jnp.int32, (1, W, 1), 1)
    wvalid = (wpos < wv).astype(v.dtype)
    v = v * wvalid
    left = (kernel_size - 1) // 2
    mem = depthwise_conv(v, ap["fsmn_block"], left, kernel_size - 1 - left) + v

    kv_new = jnp.concatenate([k * wvalid, v], axis=-1)  # (B, W, 2D)
    full_kv = jnp.concatenate([kv_cache, kv_new], axis=1)  # (B, C+W, 2D)
    kf, vf = jnp.split(full_kv, 2, axis=-1)

    q_h = q.reshape(B, W, n_head, d_k) * (d_k ** -0.5)
    k_h = kf.reshape(B, C + W, n_head, d_k)
    v_h = vf.reshape(B, C + W, n_head, d_k)
    scores = jnp.einsum("bwhd,bshd->bhws", q_h, k_h).astype(jnp.float32)
    pos = lax.broadcasted_iota(jnp.int32, (1, 1, 1, C + W), 3)
    valid = ((pos >= (C - kv_valid))  # first C-valid cache slots are empty
             & (pos < C + jnp.reshape(wv, (-1, 1, 1, 1))))  # trailing pads
    scores = jnp.where(valid, scores, jnp.finfo(jnp.float32).min)
    attn = jax.nn.softmax(scores, axis=-1).astype(v_h.dtype)
    ctx = jnp.einsum("bhws,bshd->bwhd", attn, v_h).reshape(B, W, D)
    att_out = dense(ap["linear_out"], ctx) + mem

    y = x + att_out if not first else att_out
    res = y
    h2 = layer_norm(lp["norm2"], y)
    ff = dense(lp["feed_forward"]["w_2"], jax.nn.relu(dense(lp["feed_forward"]["w_1"], h2)))
    y = res + ff

    # cache update: append the first `keep` window frames, keep last C
    new_cache = jnp.concatenate([kv_cache, kv_new[:, :keep]], axis=1)[:, -C:]
    return y, new_cache


def _streaming_pe(positions, depth):
    """Reference SinusoidalPositionEncoderOnline.encode (embedding.py:423):
    PE(p) = [sin(p * inv_ts), cos(p * inv_ts)], computed analytically so
    long-running streams never clip/freeze.  positions: (..., W) float."""
    log_inc = jnp.log(10000.0) / (depth / 2 - 1)
    inv_ts = jnp.exp(jnp.arange(depth // 2, dtype=jnp.float32) * -log_inc)
    scaled = positions[..., None] * inv_ts
    return jnp.concatenate([jnp.sin(scaled), jnp.cos(scaled)], axis=-1)


def encoder_chunk(enc_params, window, state: EncChunkState, start_idx,
                  win_valid, *, n_head: int, kernel_size: int, d_model: int,
                  keep: int, overlap: int):
    """window: (B, W, D_in) = [overlap cached frames | c new frames] ->
    (enc_out (B,W,d_model), state').

    Positional encoding follows the reference exactly (scama/encoder.py:468
    + embedding.py:438): each frame keeps the PE of its ABSOLUTE position —
    new frames get positions start_idx+1.., cached frames keep the PE they
    received when they were new, and the initial zero-fill frames (absolute
    position < 0) get none, matching the reference's un-embedded zero
    ``feats`` cache."""
    B, W, D_in = window.shape
    x = window.astype(jnp.float32) * (d_model ** 0.5)
    # start_idx: () shared or (B,) per-row absolute new-frame counts
    start = jnp.reshape(jnp.asarray(start_idx), (-1, 1))  # (1|B, 1)
    abs_idx = start - overlap + jnp.arange(W)[None]  # (1|B, W)
    pe = _streaming_pe((abs_idx + 1).astype(jnp.float32), D_in)
    x = x + pe * (abs_idx >= 0)[..., None]

    x, c0 = _enc_layer_chunk(
        enc_params["encoders0"], x, state.kv[0], state.kv_valid, win_valid,
        n_head=n_head, kernel_size=kernel_size, first=True, keep=keep,
    )

    def body(carry, layer):
        xx = carry
        lp, cache = layer
        y, nc = _enc_layer_chunk(
            lp, xx, cache, state.kv_valid, win_valid,
            n_head=n_head, kernel_size=kernel_size, first=False, keep=keep,
        )
        return y, nc

    x, stacked_caches = lax.scan(
        body, x, (enc_params["encoders"], state.kv[1:])
    )
    x = layer_norm(enc_params["after_norm"], x)
    new_kv = jnp.concatenate([c0[None], stacked_caches], axis=0)
    C = state.kv.shape[2]
    new_valid = jnp.minimum(state.kv_valid + keep, C)
    return x, EncChunkState(new_kv, new_valid)


def init_enc_state(n_layers: int, batch: int, cache_len: int, d_model: int):
    return EncChunkState(
        kv=jnp.zeros((n_layers, batch, cache_len, 2 * d_model), jnp.float32),
        kv_valid=jnp.zeros((), jnp.int32),
    )


# ---------------------------------------------------------------- CIF chunk
class CifState(NamedTuple):
    integrate: jnp.ndarray  # (B,)
    frame: jnp.ndarray  # (B, D) accumulated weighted hidden


def predictor_alphas(pred_params, hidden):
    """conv -> relu -> linear -> sigmoid (CifPredictorV2 head)."""
    h = hidden.astype(jnp.float32)
    q = lax.conv_general_dilated(
        h, pred_params["cif_conv1d"].astype(jnp.float32), (1,),
        [(1, 1)], dimension_numbers=("NHC", "HIO", "NHC"),
    ) + pred_params["cif_conv1d_bias"]
    q = jax.nn.relu(q)
    out = dense(pred_params["cif_output"], q)
    return jax.nn.sigmoid(out[..., 0])


def cif_chunk(hidden, alphas, state: CifState, max_tokens: int):
    """Integrate-and-fire over one chunk with carried state.

    hidden/alphas: (B, T, D)/(B, T) — alphas already masked to the firing
    region.  Returns (embeds (B,U,D), n_tokens (B,), state').
    """
    B, T, D = hidden.shape
    # prepend the carry as a pseudo-frame: alpha=integrate, hidden=frame/integrate
    carry_alpha = state.integrate[:, None]
    carry_hidden = jnp.where(
        state.integrate[:, None] > 0,
        state.frame / jnp.maximum(state.integrate[:, None], 1e-9),
        state.frame,
    )[:, None, :]
    a = jnp.concatenate([carry_alpha, alphas.astype(jnp.float32)], axis=1)
    h = jnp.concatenate([carry_hidden, hidden.astype(jnp.float32)], axis=1)

    S = jnp.cumsum(a, axis=-1)
    P = S - a
    grid = lax.broadcasted_iota(jnp.float32, (1, max_tokens, 1), 1)
    w = jnp.clip(jnp.minimum(S[:, None, :], grid + 1.0)
                 - jnp.maximum(P[:, None, :], grid), 0.0, 1.0)
    embeds = jnp.einsum("but,btd->bud", w, h, preferred_element_type=jnp.float32)

    total = S[:, -1]
    n_tokens = jnp.floor(total).astype(jnp.int32)
    new_integrate = total - n_tokens
    # un-normalized partial mass of the trailing token
    idx = jnp.clip(n_tokens, 0, max_tokens - 1)
    tail = jnp.take_along_axis(embeds, idx[:, None, None].repeat(embeds.shape[-1], -1), axis=1)[:, 0]
    return embeds, n_tokens, CifState(new_integrate, tail)


def init_cif_state(batch: int, d_model: int):
    return CifState(jnp.zeros((batch,)), jnp.zeros((batch, d_model)))


# ------------------------------------------------------------ decoder chunk
class DecChunkState(NamedTuple):
    fsmn: jnp.ndarray  # (L, B, kernel-1, D) conv-input tails
    fsmn3: jnp.ndarray  # (B, kernel-1, D) placeholder (decoders3 has no fsmn)
    started: jnp.ndarray  # (B,) bool: this row's FSMN stream has begun


def fsmn_stream(h2, n_tokens, fsmn_kernel, fsmn_cache, started, *,
                kernel_size: int):
    """Streaming decoder FSMN memory over a padded token grid.

    h2: (B, U, D) pre-masked token hiddens (rows >= n_tokens zero);
    fsmn_cache: (B, K-1, D) stream tail; started: (B,) bool.
    Returns (mem (B,U,D) = conv + h2, new_cache).

    Matches the reference exactly (sanm/attention.py:499-537): the first
    fired chunk is convolved with symmetric padding (like offline) and its
    right zero-pad enters the stream; later chunks are causal over
    [cache, tokens]; the cache only advances on chunks that fired.
    """
    B, U, D = h2.shape
    K = kernel_size
    left = (K - 1) // 2
    right = K - 1 - left
    ctx = jnp.concatenate(
        [fsmn_cache.astype(h2.dtype), h2,
         jnp.zeros((B, right, D), h2.dtype)], axis=1
    )  # (B, K-1+U+right, D)
    out = depthwise_conv(ctx, fsmn_kernel, 0, 0)
    # out[j] covers ctx[j : j+K]; token t sits at ctx index K-1+t:
    # causal -> window ends at the token (j = t); symmetric first
    # chunk -> token centered (j = t + right)
    st = started[:, None, None]
    mem = jnp.where(st, out[:, :U], out[:, right:right + U]) + h2
    # stream cache: last K-1 entries ending at the last valid token,
    # plus the one-time right-pad gap after the first fired chunk
    gap = jnp.where(started, 0, right)  # (B,)
    idx = (n_tokens + gap)[:, None] + jnp.arange(K - 1)[None, :]
    cand = jnp.take_along_axis(ctx, idx[:, :, None], axis=1)
    fired = (n_tokens > 0)[:, None, None]
    new_cache = jnp.where(fired, cand, fsmn_cache.astype(h2.dtype))
    return mem, new_cache


def _dec_layer_chunk(lp, x, tgt_mask, memory, memory_mask, fsmn_cache,
                     started, n_tokens, *, n_head, kernel_size,
                     has_self=True, has_src=True):
    """Reference decoder-FSMN streaming semantics
    (sanm/attention.py:499-537 MultiHeadedAttentionSANMDecoder.forward):

    - FIRST call (cache=None): symmetric padding ((k-1)//2, k-1-left) —
      identical to the offline decoder — and the cache keeps the padded
      sequence, so the one-time right zero-pad enters the token stream
      between the first and second chunk.
    - LATER calls: causal conv over [cache tail, new tokens].
    - The cache only advances on chunks that fired tokens (the reference
      skips the decoder entirely when pre_token_length < 1,
      paraformer_streaming/model.py:499).

    Static-shape port: token grids are padded to U with n_tokens valid
    (pad rows zeroed by tgt_mask); both alignments come from one unpadded
    conv over [cache (k-1), grid (U), zeros (right)], and the new cache is
    gathered at the last valid token (+right gap on the first chunk).
    """
    res = x
    h = layer_norm(lp["norm1"], x)
    ffp = lp["feed_forward"]
    ff = jax.nn.relu(dense(ffp["w_1"], h))
    ff = layer_norm(ffp["norm"], ff)
    h = dense(ffp["w_2"], ff)

    y = h
    new_cache = fsmn_cache
    if has_self:
        h2 = layer_norm(lp["norm2"], h)
        if tgt_mask is not None:
            h2 = h2 * tgt_mask  # pad rows must stay zero (stream gathers)
        mem, new_cache = fsmn_stream(
            h2, n_tokens, lp["self_attn"]["fsmn_block"], fsmn_cache, started,
            kernel_size=kernel_size)
        if tgt_mask is not None:
            mem = mem * tgt_mask
        y = res + mem
    if has_src:
        res = y
        h3 = layer_norm(lp["norm3"], y)
        sp = lp["src_attn"]
        B, U, D = h3.shape
        T = memory.shape[1]
        d_k = D // n_head
        q = dense(sp["linear_q"], h3).reshape(B, U, n_head, d_k) * (d_k ** -0.5)
        kv = dense(sp["linear_k_v"], memory)
        k, v = jnp.split(kv, 2, axis=-1)
        k = k.reshape(B, T, n_head, d_k)
        v = v.reshape(B, T, n_head, d_k)
        scores = jnp.einsum("buhd,bthd->bhut", q, k).astype(jnp.float32)
        if memory_mask is not None:
            scores = jnp.where(memory_mask[:, None, None, :] != 0, scores,
                               jnp.finfo(jnp.float32).min)
        attn = jax.nn.softmax(scores, -1).astype(v.dtype)
        ctx2 = jnp.einsum("bhut,bthd->buhd", attn, v).reshape(B, U, D)
        y = res + dense(sp["linear_out"], ctx2)
    return y, new_cache


def decoder_chunk(dec_params, embeds, n_tokens, memory, state: DecChunkState,
                  *, n_head: int, kernel_size: int, memory_valid=None):
    """embeds: (B, U, D) CIF tokens (padded); memory: (B, W, D) chunk encoder
    out; memory_valid: () int32 — memory frames beyond it are final-chunk
    padding, masked out of cross-attention.  Returns (log_probs, state')."""
    B, U, D = embeds.shape
    tgt_mask = (lax.broadcasted_iota(jnp.int32, (1, U), 1)
                < n_tokens[:, None]).astype(embeds.dtype)[:, :, None]
    memory_mask = None
    if memory_valid is not None:
        memory_mask = (lax.broadcasted_iota(jnp.int32, (1, memory.shape[1]), 1)
                       < memory_valid).astype(jnp.int32)
    x = embeds

    def body(carry, layer):
        xx = carry
        lp, cache = layer
        y, nc = _dec_layer_chunk(
            lp, xx, tgt_mask, memory, memory_mask, cache, state.started,
            n_tokens, n_head=n_head, kernel_size=kernel_size,
        )
        return y, nc

    x, new_fsmn = lax.scan(body, x, (dec_params["decoders"], state.fsmn))
    # decoders3: FFN-only, no residual (reference decoder.py:96-121 with
    # self_attn=src_attn=None)
    lp3 = dec_params["decoders3"]
    h = layer_norm(lp3["norm1"], x)
    ffp = lp3["feed_forward"]
    x = dense(ffp["w_2"], layer_norm(ffp["norm"], jax.nn.relu(dense(ffp["w_1"], h))))
    x = layer_norm(dec_params["after_norm"], x)
    logits = dense(dec_params["output_layer"], x)
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
    # the stream starts once a chunk fires (reference keeps cache=None —
    # offline-style symmetric pad — until the first decoded chunk)
    new_started = state.started | (n_tokens > 0)
    return log_probs, DecChunkState(new_fsmn, state.fsmn3, new_started)


def init_dec_state(n_layers: int, batch: int, kernel_size: int, d_model: int):
    return DecChunkState(
        fsmn=jnp.zeros((n_layers, batch, kernel_size - 1, d_model), jnp.float32),
        fsmn3=jnp.zeros((batch, kernel_size - 1, d_model), jnp.float32),
        started=jnp.zeros((batch,), jnp.bool_),
    )

"""Sequence-parallel Paraformer decoder: cross-attention over sharded memory.

Completes the long-audio SP inference path: the encoder memory produced by
``parallel.sp_encoder`` STAYS sharded on the frame axis, and the NAR
decoder (small token axis, replicated) cross-attends it in place:

- each shard scores its local memory block, then one ``pmax`` (global
  softmax max) + two ``psum`` (weighted values, denominator) combine the
  exact softmax over the full memory — cheaper than a ring because the
  queries are replicated;
- the token-axis FSMN self-memory, FFNs, and layernorms are replicated
  and collective-free.

Consumes the unmodified ``ParaformerSANMDecoder`` parameter tree
(models/paraformer/decoder.py:303); the unit test pins fp32 equality
against the single-device module, and a chained test runs
sp_encoder -> sp_decoder without ever gathering the memory.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from funasr_tpu.models.sanm import fsmn_conv, ln_f32
from funasr_tpu.parallel.sp_encoder import _fsmn_sp  # noqa: F401 (re-export)

NEG_INF = -1e30


def sp_cross_attention(q, k, v, kmask, axis: str = "model"):
    """Exact softmax cross-attention, replicated queries x sharded keys.

    q: (B, U, H, Dh) replicated; k/v: (B, T_local, H, Dh) local memory
    shard; kmask: (B, T_local).  One pmax + two psums over ``axis``.
    Scores/softmax are fp32 regardless of input dtype (masked_softmax
    recipe).  Returns (B, U, H, Dh) replicated, fp32.
    """
    dh = q.shape[-1]
    q = q * (dh ** -0.5)
    s = jnp.einsum("buhd,bthd->bhut", q, k,
                   preferred_element_type=jnp.float32)  # (B, H, U, Tl)
    s = jnp.where(kmask[:, None, None, :], s, NEG_INF)
    m = lax.pmax(jnp.max(s, axis=-1), axis)       # (B, H, U) global max
    p = jnp.exp(s - m[..., None])
    p = jnp.where(kmask[:, None, None, :], p, 0.0)
    num = lax.psum(jnp.einsum("bhut,bthd->buhd", p.astype(v.dtype), v,
                              preferred_element_type=jnp.float32), axis)
    den = lax.psum(jnp.sum(p, axis=-1), axis)     # (B, H, U)
    den = den.transpose(0, 2, 1)[..., None]       # (B, U, H, 1)
    return num / jnp.maximum(den, 1e-30)


def _dec_ffn(x, p, dtype):
    """FeedForwardDecoderSANM (decoder.py:34): w_2(LN(relu(w_1 x))),
    w_2 bias-free."""
    h = jax.nn.relu(x @ p["w_1"]["kernel"].astype(dtype)
                    + p["w_1"]["bias"].astype(dtype))
    h = ln_f32(h, p["norm"]["scale"], p["norm"]["bias"]).astype(dtype)
    return h @ p["w_2"]["kernel"].astype(dtype)


def _dec_layer_sp(x, p: Dict[str, Any], tgt_mask, mem, kmask, *,
                  n_head: int, kernel_size: int, sanm_shift: int,
                  has_self: bool, has_src: bool, axis: str,
                  dtype=jnp.float32):
    """DecoderLayerSANM (decoder.py:214): FFN -> FSMN -> cross-attn."""
    residual = x
    h = ln_f32(x, p["norm1"]["scale"], p["norm1"]["bias"]).astype(dtype)
    h = _dec_ffn(h, p["feed_forward"], dtype)

    x = h
    if has_self:
        left = (kernel_size - 1) // 2 + max(sanm_shift, 0)
        right = kernel_size - 1 - left
        h2 = ln_f32(h, p["norm2"]["scale"],
                    p["norm2"]["bias"]).astype(dtype)
        # token-axis FSMN is replicated: plain masked depthwise conv
        # (fsmn_memory semantics; conv core shared via fsmn_conv)
        hm = h2 * tgt_mask.astype(dtype)
        out = fsmn_conv(hm, p["self_attn"]["fsmn_block"], [(left, right)])
        x = (out + hm) * tgt_mask.astype(dtype)
        x = residual + x

    if has_src:
        residual = x
        h3 = ln_f32(x, p["norm3"]["scale"],
                    p["norm3"]["bias"]).astype(dtype)
        B, U, D = h3.shape
        dh = D // n_head
        q = h3 @ p["src_attn"]["linear_q"]["kernel"].astype(dtype) \
            + p["src_attn"]["linear_q"]["bias"].astype(dtype)
        kv = mem @ p["src_attn"]["linear_k_v"]["kernel"].astype(dtype) \
            + p["src_attn"]["linear_k_v"]["bias"].astype(dtype)
        k, v = jnp.split(kv, 2, axis=-1)
        Tl = mem.shape[1]
        ctx = sp_cross_attention(
            q.reshape(B, U, n_head, dh), k.reshape(B, Tl, n_head, dh),
            v.reshape(B, Tl, n_head, dh), kmask, axis,
        ).reshape(B, U, D).astype(dtype)
        s = ctx @ p["src_attn"]["linear_out"]["kernel"].astype(dtype) \
            + p["src_attn"]["linear_out"]["bias"].astype(dtype)
        x = residual + s
    return x


def sp_sanm_decoder(variables, memory, memory_lengths, semantic_embeds,
                    token_lengths, mesh: Mesh, *, attention_heads: int,
                    att_layer_num: Optional[int] = None,
                    num_blocks: Optional[int] = None,
                    linear_units: Optional[int] = None,
                    kernel_size: int = 11, sanm_shift: int = 0,
                    seq_axis: str = "model", dtype=jnp.float32):
    """ParaformerSANMDecoder.__call__ with the MEMORY frame axis sharded.

    ``memory`` may already carry the P(None, seq_axis, None) sharding from
    sp_sanm_encoder — it is consumed in place, never gathered.  Returns
    logits (B, U, vocab), replicated.  ``att_layer_num``/``num_blocks``/
    ``linear_units`` are accepted for config-dict symmetry but the layer
    structure is read off the parameter tree itself.
    """
    from jax import shard_map

    params = variables["params"] if "params" in variables else variables
    B, T, D = memory.shape
    U = semantic_embeds.shape[1]
    n = mesh.shape[seq_axis]
    if T % n:
        raise ValueError(f"T={T} not divisible by {seq_axis} size {n}")

    kmask = jnp.arange(T)[None, :] < memory_lengths[:, None]
    tgt_mask = (jnp.arange(U)[None, :] < token_lengths[:, None]
                ).astype(semantic_embeds.dtype)[:, :, None]

    layer = functools.partial(
        _dec_layer_sp, n_head=attention_heads, kernel_size=kernel_size,
        sanm_shift=sanm_shift, axis=seq_axis, dtype=dtype)

    def staged(params, x, tgt_mask, mem, kmask):
        def body(h, pl):
            return layer(h, pl, tgt_mask, mem, kmask,
                         has_self=True, has_src=True), None

        x, _ = lax.scan(body, x, params["decoders"])
        if "decoders2" in params:
            # decoders2 layers are FSMN+FFN only (has_src=False,
            # decoder.py:345)
            def body2(h, pl):
                return layer(h, pl, tgt_mask, mem, kmask,
                             has_self=True, has_src=False), None

            x, _ = lax.scan(body2, x, params["decoders2"])
        x = layer(x, params["decoders3"], tgt_mask, mem, kmask,
                  has_self=False, has_src=False)
        x = ln_f32(x, params["after_norm"]["scale"],
                   params["after_norm"]["bias"]).astype(dtype)
        if "output_layer" in params:
            x = x @ params["output_layer"]["kernel"].astype(dtype) \
                + params["output_layer"]["bias"].astype(dtype)
        return x

    spec_mem = P(None, seq_axis, None)
    spec_km = P(None, seq_axis)
    fn = shard_map(staged, mesh=mesh,
                   in_specs=(P(), P(), P(), spec_mem, spec_km),
                   out_specs=P())
    cons = lambda a, s: lax.with_sharding_constraint(
        a, NamedSharding(mesh, s))
    return fn(params, semantic_embeds.astype(dtype), tgt_mask,
              cons(memory.astype(dtype), spec_mem), cons(kmask, spec_km))

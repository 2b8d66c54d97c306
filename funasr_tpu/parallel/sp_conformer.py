"""Sequence-parallel Conformer encoder: ring rel-pos attention + halo conv.

Extends the sp story (sp_encoder.py) to the second flagship encoder
family: ``ConformerEncoder`` (models/conformer.py) with the FRAME axis
sharded over a mesh axis.

- Relative-position attention (Transformer-XL rel-shift) rides the ring:
  each chip precomputes its local position-query matrix
  ``qp = q_v · p`` over the FULL 2T-1 relative range once, and every
  ring step slices the 2·Tl-1 window that corresponds to the K-block's
  global offset — the within-block structure is then the standard
  rel_shift, so the exact (T, T) bias is reassembled blockwise while
  only (Tl, Tl) scores ever materialize.
- The convolution module needs only a kernel//2 halo each side: the halo
  frames are exchanged once per layer and the UNMODIFIED
  ``ConvolutionModule`` flax module is applied to the extended shard
  (pointwise ops on halo frames are recomputed and trimmed — module
  reuse means the math cannot drift from models/conformer.py).
- Macaron/final FFNs and layernorms are frame-local; they also run
  through the real flax modules (``FeedForward``) / the shared
  ``ln_f32``.

Consumes the UNMODIFIED ``ConformerEncoder`` variables (params +
batch_stats); the unit test pins fp32 equality against the single-device
module.  ``dtype=jnp.bfloat16`` keeps bf16 matmuls with fp32
norms/softmax like the single-chip path.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from funasr_tpu.models.conformer import (ConvolutionModule,
                                         Conv2dSubsampling, FeedForward,
                                         rel_positional_encoding,
                                         rel_shift)
from funasr_tpu.models.sanm import ln_f32

NEG_INF = -1e30


def _halo_extend(h, left: int, right: int, axis: str, n: int):
    """Concatenate `left`/`right` neighbour frames (zeros at the edges —
    identical to zero padding)."""
    Tl = h.shape[1]
    parts = []
    if left:
        parts.append(lax.ppermute(h[:, Tl - left:], axis,
                                  [(i, i + 1) for i in range(n - 1)]))
    parts.append(h)
    if right:
        parts.append(lax.ppermute(h[:, :right], axis,
                                  [(i + 1, i) for i in range(n - 1)]))
    return jnp.concatenate(parts, axis=1)


def _ring_relpos_attention(q_u, q_v, k, v, kmask, p_full, *, axis: str,
                           n: int, T: int):
    """Online-softmax ring attention with the Transformer-XL position
    term: q_u/q_v/k/v (B, Tl, H, Dh) local shards, kmask (B, Tl) local,
    p_full (2T-1, H, Dh) replicated.  Returns (B, Tl, H, Dh) fp32.

    Per ring step the K/V/mask blocks rotate; the position bias for the
    block that originated on shard ``src`` covers relative offsets
    (me-src)*Tl + (t - s), i.e. a contiguous 2Tl-1 column window of the
    local ``qp`` matrix, reassembled with the standard rel_shift.
    """
    B, Tl, H, dh = q_u.shape
    scale = dh ** -0.5
    me = lax.axis_index(axis)

    # local position-query matrix over the full relative range:
    # qp[b,h,t,l] = q_v[b,t,h,:] . p_full[l,h,:]
    qp = jnp.einsum("bthd,lhd->bhtl", q_v, p_full,
                    preferred_element_type=jnp.float32)

    m = jnp.full((B, Tl, H), NEG_INF, jnp.float32) + (me * 0.0)
    l = jnp.zeros((B, Tl, H), jnp.float32) + (me * 0.0)
    o = jnp.zeros((B, Tl, H, dh), jnp.float32) + (me * 0.0)

    perm = [(i, (i + 1) % n) for i in range(n)]

    def step(carry, s):
        m, l, o, k_blk, v_blk, mask_blk = carry
        # the block on this device at step s originated on shard
        # src = (me - s) mod n; as an INTEGER me - src = s - n*(s > me)
        off = s - n * (s > me).astype(s.dtype)          # me - src
        # window start: (T - Tl) - off*Tl  (always within [0, 2T-2Tl])
        start = (T - Tl) - off * Tl
        qp_win = lax.dynamic_slice_in_dim(qp, start, 2 * Tl - 1, axis=3)
        bd = rel_shift(qp_win)                          # (B, H, Tl, Tl)
        ac = jnp.einsum("bthd,bshd->bhts", q_u, k_blk,
                        preferred_element_type=jnp.float32)
        sc = (ac + bd) * scale
        sc = jnp.where(mask_blk[:, None, None, :], sc, NEG_INF)
        m_blk = jnp.max(sc, axis=-1)                    # (B, H, Tl)
        m_new = jnp.maximum(m, m_blk.transpose(0, 2, 1))
        pexp = jnp.exp(sc - m_new.transpose(0, 2, 1)[..., None])
        pexp = jnp.where(mask_blk[:, None, None, :], pexp, 0.0)
        sfac = jnp.exp(m - m_new)
        l_new = l * sfac + jnp.sum(pexp, axis=-1).transpose(0, 2, 1)
        o_new = o * sfac[..., None] + jnp.einsum(
            "bhts,bshd->bthd", pexp.astype(v_blk.dtype), v_blk,
            preferred_element_type=jnp.float32)
        k_blk = lax.ppermute(k_blk, axis, perm)
        v_blk = lax.ppermute(v_blk, axis, perm)
        mask_blk = lax.ppermute(mask_blk, axis, perm)
        return (m_new, l_new, o_new, k_blk, v_blk, mask_blk), None

    (m, l, o, _, _, _), _ = lax.scan(step, (m, l, o, k, v, kmask),
                                     jnp.arange(n))
    return o / jnp.maximum(l, 1e-30)[..., None]


def _conformer_layer_sp(x, p: Dict[str, Any], bs: Dict[str, Any], kmask,
                        p_full, *, n_head: int, cnn_kernel: int,
                        axis: str, n: int, T: int, dtype=jnp.float32):
    """One ConformerEncoderLayer (models/conformer.py:161), frame axis
    sharded.  FFN/conv sublayers run through the REAL flax modules."""
    size = x.shape[-1]
    ffn = lambda name: FeedForward(
        p[name]["w_1"]["kernel"].shape[1], size, 0.0, dtype, jnp.float32)

    # macaron FFN
    res = x
    h = ln_f32(x, p["norm_ff_macaron"]["scale"],
               p["norm_ff_macaron"]["bias"]).astype(dtype)
    h = ffn("feed_forward_macaron").apply(
        {"params": p["feed_forward_macaron"]}, h, True)
    x = res + 0.5 * h

    # rel-pos self-attention (ring)
    res = x
    h = ln_f32(x, p["norm_mha"]["scale"], p["norm_mha"]["bias"]).astype(dtype)
    pa = p["self_attn"]
    dh = size // n_head
    B, Tl, _ = h.shape
    q = h @ pa["linear_q"]["kernel"].astype(dtype) \
        + pa["linear_q"]["bias"].astype(dtype)
    k = h @ pa["linear_k"]["kernel"].astype(dtype) \
        + pa["linear_k"]["bias"].astype(dtype)
    v = h @ pa["linear_v"]["kernel"].astype(dtype) \
        + pa["linear_v"]["bias"].astype(dtype)
    pp = p_full.astype(dtype) @ pa["linear_pos"]["kernel"].astype(dtype)
    pp = pp.reshape(-1, n_head, dh)
    q = q.reshape(B, Tl, n_head, dh)
    q_u = q + pa["pos_bias_u"].astype(q.dtype)
    q_v = q + pa["pos_bias_v"].astype(q.dtype)
    ctx = _ring_relpos_attention(
        q_u, q_v, k.reshape(B, Tl, n_head, dh),
        v.reshape(B, Tl, n_head, dh), kmask, pp,
        axis=axis, n=n, T=T).reshape(B, Tl, size).astype(dtype)
    h = ctx @ pa["linear_out"]["kernel"].astype(dtype) \
        + pa["linear_out"]["bias"].astype(dtype)
    x = res + h

    # convolution module: halo exchange + the unmodified flax module
    res = x
    h = ln_f32(x, p["norm_conv"]["scale"],
               p["norm_conv"]["bias"]).astype(dtype)
    halo = (cnn_kernel - 1) // 2
    h_ext = _halo_extend(h, halo, halo, axis, n)
    conv = ConvolutionModule(size, cnn_kernel, dtype, jnp.float32)
    out = conv.apply({"params": p["conv_module"],
                      "batch_stats": bs["conv_module"]},
                     h_ext, None, True)
    x = res + out[:, halo:halo + Tl]

    # final FFN + norm
    res = x
    h = ln_f32(x, p["norm_ff"]["scale"], p["norm_ff"]["bias"]).astype(dtype)
    h = ffn("feed_forward").apply({"params": p["feed_forward"]}, h, True)
    x = res + 0.5 * h
    return ln_f32(x, p["norm_final"]["scale"],
                  p["norm_final"]["bias"]).astype(dtype)


def sp_conformer_encoder(variables, xs, lengths, mesh: Mesh, *,
                         output_size: int, attention_heads: int,
                         linear_units: int, num_blocks: int,
                         cnn_module_kernel: int = 15,
                         input_layer: str = "conv2d",
                         seq_axis: str = "model", dtype=jnp.float32):
    """ConformerEncoder.__call__ with the (subsampled) frame axis sharded.

    The conv2d subsampling front runs replicated (cheap, stride-4); the
    layer stack runs sharded.  The SUBSAMPLED length T' must divide by
    the mesh axis and give shards >= the conv halo.  Returns
    (out, lengths) like the module.
    """
    from jax import shard_map

    params = variables["params"] if "params" in variables else variables
    bstats = variables.get("batch_stats", {})
    n = mesh.shape[seq_axis]

    if input_layer == "conv2d":
        sub = Conv2dSubsampling(output_size, dtype, jnp.float32)
        x, lengths = sub.apply({"params": params["embed"]}, xs, lengths)
    elif input_layer == "linear":
        x = xs.astype(dtype) @ params["embed"]["kernel"].astype(dtype) \
            + params["embed"]["bias"].astype(dtype)
    else:
        raise NotImplementedError(input_layer)
    B, T, _ = x.shape
    if T % n:
        raise ValueError(f"subsampled T={T} not divisible by "
                         f"{seq_axis} size {n}")
    halo = (cnn_module_kernel - 1) // 2
    if T // n < halo:
        raise ValueError("shard shorter than the conv halo")

    x = x * (output_size ** 0.5)
    p_full = rel_positional_encoding(T, output_size)
    kmask = jnp.arange(T)[None, :] < lengths[:, None]

    layer = functools.partial(
        _conformer_layer_sp, n_head=attention_heads,
        cnn_kernel=cnn_module_kernel, axis=seq_axis, n=n, T=T,
        dtype=dtype)

    def staged(params, bstats, x, kmask, p_full):
        def body(h, sl):
            pl, bl = sl
            return layer(h, pl, bl, kmask, p_full), None

        x, _ = lax.scan(body, x, (params["encoders"],
                                  bstats["encoders"]))
        return ln_f32(x, params["after_norm"]["scale"],
                      params["after_norm"]["bias"]).astype(dtype)

    spec_x = P(None, seq_axis, None)
    spec_m = P(None, seq_axis)
    fn = shard_map(staged, mesh=mesh,
                   in_specs=(P(), P(), spec_x, spec_m, P()),
                   out_specs=spec_x)
    cons = lambda a, s: lax.with_sharding_constraint(
        a, NamedSharding(mesh, s))
    out = fn(params, bstats, cons(x.astype(dtype), spec_x),
             cons(kmask, spec_m), p_full)
    return out, lengths

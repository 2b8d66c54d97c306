"""Sequence-parallel SANM encoder: long-audio inference over a mesh.

Runs the EXACT SANMEncoder computation (models/sanm.py — layernorms,
fused-QKV SANM attention with FSMN memory, FFN, after_norm) with the
FRAME axis sharded over a mesh axis, so a single utterance's encoder
state is distributed across chips:

- attention goes through ring attention (parallel/ring_attention.py):
  K/V blocks rotate over ``lax.ppermute``; each chip only materializes a
  (T/n, T/n) score block;
- the FSMN depthwise memory exchanges ``left``/``right`` halo frames with
  the neighbouring shards (one ppermute each way) and convolves VALID —
  identical math to the padded full-sequence conv;
- layernorms / projections / FFN are frame-local and need no collectives.

It consumes the UNMODIFIED parameter tree of ``SANMEncoder`` (same
checkpoints, converters, and init), and the unit test pins fp32 equality
against the single-device encoder.  The norm/conv cores are SHARED with
models/sanm.py (``ln_f32``, ``fsmn_conv``) so the math cannot drift.

``dtype=jnp.bfloat16`` runs the matmuls/FFN in bf16 with fp32 layernorms
and fp32 attention softmax — the same mixed-precision recipe as the
single-chip serving path — so long-audio SP keeps MXU-rate math.

This is the "sp" axis of the dp/tp/sp/pp story: ring+halo sequence
parallelism the reference (DDP-only, single-GPU streams) has no analogue
for.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from funasr_tpu.models.sanm import fsmn_conv, ln_f32
from funasr_tpu.parallel.ring_attention import ring_self_attention

# retained names for intra-package reuse (sp_decoder imports these)
_ln_f32 = ln_f32


def _fsmn_sp(v, kernel, kmask, left: int, right: int, axis: str, n: int):
    """FSMN depthwise memory with halo exchange (models/sanm.py
    ``fsmn_memory`` semantics; conv core shared via ``fsmn_conv``).

    v: (B, Tl, D) local value shard (already key-masked); kernel: (K,1,D).
    Halo frames come from the neighbouring shards via ppermute; edge
    shards receive zeros (ppermute leaves uncovered destinations zero),
    which equals the reference's zero padding.
    """
    B, Tl, D = v.shape
    parts = []
    if left:
        lh = lax.ppermute(v[:, Tl - left:], axis,
                          [(i, i + 1) for i in range(n - 1)])
        parts.append(lh)
    parts.append(v)
    if right:
        rh = lax.ppermute(v[:, :right], axis,
                          [(i + 1, i) for i in range(n - 1)])
        parts.append(rh)
    padded = jnp.concatenate(parts, axis=1)
    out = fsmn_conv(padded, kernel, "VALID")
    out = out + v
    return out * kmask[..., None].astype(v.dtype)


def _sanm_layer_sp(x, p: Dict[str, Any], kmask, *, n_head: int,
                   kernel_size: int, sanm_shift: int, first: bool,
                   axis: str, n: int, dtype=jnp.float32):
    """One EncoderLayerSANM (models/sanm.py:335), frame axis sharded.

    ``first`` means in_size != size (the 560->512 resize layer): only then
    is the attention residual skipped (encoder.py:120-137 semantics).
    Matmuls run in ``dtype``; norms and the attention softmax stay fp32
    (LayerNormF32 / masked_softmax recipe).
    """
    D = p["self_attn"]["linear_out"]["kernel"].shape[1]
    dh = D // n_head
    left = (kernel_size - 1) // 2 + max(sanm_shift, 0)
    right = kernel_size - 1 - left

    residual = x
    h = ln_f32(x, p["norm1"]["scale"], p["norm1"]["bias"]).astype(dtype)
    qkv = h @ p["self_attn"]["linear_q_k_v"]["kernel"].astype(dtype) \
        + p["self_attn"]["linear_q_k_v"]["bias"].astype(dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    vm = v * kmask[..., None].astype(v.dtype)
    mem = _fsmn_sp(vm, p["self_attn"]["fsmn_block"], kmask,
                   left, right, axis, n)

    B, Tl, _ = x.shape
    ctx = ring_self_attention(
        q.reshape(B, Tl, n_head, dh), k.reshape(B, Tl, n_head, dh),
        v.reshape(B, Tl, n_head, dh), kmask, axis_name=axis,
    ).reshape(B, Tl, D).astype(dtype)
    # NOTE: padded QUERY rows are not zeroed — the reference's key mask
    # broadcasts over queries, so padded queries attend normally over the
    # valid keys (masked_softmax, models/sanm.py); ring matches that
    attn = ctx @ p["self_attn"]["linear_out"]["kernel"].astype(dtype) \
        + p["self_attn"]["linear_out"]["bias"].astype(dtype) + mem
    x = attn if first else residual + attn

    residual = x
    h = ln_f32(x, p["norm2"]["scale"], p["norm2"]["bias"]).astype(dtype)
    h = jax.nn.relu(h @ p["feed_forward"]["w_1"]["kernel"].astype(dtype)
                    + p["feed_forward"]["w_1"]["bias"].astype(dtype))
    ff = h @ p["feed_forward"]["w_2"]["kernel"].astype(dtype) \
        + p["feed_forward"]["w_2"]["bias"].astype(dtype)
    return residual + ff


def sp_sanm_encoder(variables, xs, lengths, mesh: Mesh, *,
                    output_size: int, attention_heads: int,
                    linear_units: int, num_blocks: int,
                    kernel_size: int = 11, sanm_shift: int = 0,
                    input_layer: str = "pe", seq_axis: str = "model",
                    dtype=jnp.float32):
    """SANMEncoder.__call__ with the frame axis sharded over ``seq_axis``.

    ``variables``: the SANMEncoder param tree (init or converted weights);
    ``xs``: (B, T, input_size) with T divisible by the mesh axis size and
    T/n >= kernel context; ``lengths``: (B,).  ``dtype``: compute dtype
    for the matmul path (fp32 norms/softmax either way).  Returns
    (out, lengths) like the module.
    """
    from jax import shard_map

    from funasr_tpu.ops.posenc import sinusoidal_encoding

    params = variables["params"] if "params" in variables else variables
    B, T, Din = xs.shape
    n = mesh.shape[seq_axis]
    if T % n:
        raise ValueError(f"T={T} not divisible by {seq_axis} size {n}")
    left = (kernel_size - 1) // 2 + max(sanm_shift, 0)
    if T // n < max(left, kernel_size - 1 - left):
        raise ValueError("shard shorter than the FSMN halo")

    x = xs.astype(dtype) * (output_size ** 0.5)
    if input_layer == "pe":
        pe = sinusoidal_encoding(T, Din, dtype=jnp.float32)
        x = x + pe[None, :, :].astype(dtype)
    kmask = jnp.arange(T)[None, :] < lengths[:, None]

    def staged(params, x, kmask):
        p0 = params["encoders0"]
        h = _sanm_layer_sp(x, p0, kmask, n_head=attention_heads,
                           kernel_size=kernel_size, sanm_shift=sanm_shift,
                           first=(Din != output_size), axis=seq_axis, n=n,
                           dtype=dtype)
        if num_blocks > 1:
            layer = functools.partial(
                _sanm_layer_sp, n_head=attention_heads,
                kernel_size=kernel_size, sanm_shift=sanm_shift,
                first=False, axis=seq_axis, n=n, dtype=dtype)

            def body(hh, pl):
                return layer(hh, pl, kmask), None

            h, _ = lax.scan(body, h, params["encoders"])
        if "after_norm" in params:
            h = ln_f32(h, params["after_norm"]["scale"],
                       params["after_norm"]["bias"]).astype(dtype)
        return h

    spec_x = P(None, seq_axis, None)
    spec_m = P(None, seq_axis)
    fn = shard_map(staged, mesh=mesh,
                   in_specs=(P(), spec_x, spec_m), out_specs=spec_x)
    cons = lambda a, s: lax.with_sharding_constraint(
        a, NamedSharding(mesh, s))
    out = fn(params, cons(x, spec_x), cons(kmask, spec_m))
    return out, lengths

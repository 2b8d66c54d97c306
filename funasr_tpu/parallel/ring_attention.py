"""Ring attention: sequence-parallel self-attention over a mesh axis.

Long-audio encoders are bounded by a single chip's HBM when the frame
axis grows (full self-attention materializes (T, T) score blocks).  The
TPU-native fix is to shard the SEQUENCE axis over the mesh and rotate K/V
blocks around the ring with ``jax.lax.ppermute``, accumulating the
softmax online (flash-attention's running max/denominator), so each chip
only ever holds a (T/n, T/n) score block.  Compute overlaps the ICI
transfer ring step by construction.

This is the sequence-parallel ("sp") building block the reference has no
analogue for (its C++/ONNX runtime is single-GPU per stream; its training
is DDP-only, funasr/bin/train.py:69).  Public entry: ``ring_self_attention``
— callable under ``shard_map`` (sequence axis already sharded) — and
``ring_attention_sharded`` which wraps the shard_map over a mesh for
(B, T, H, Dh) inputs.

Numerics: online softmax is exact (not an approximation) — the unit test
checks fp32 equality with plain attention to 1e-5 over an 8-device mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

NEG_INF = -1e30


def _block(q, k, v, kmask, m, l, o):
    """One online-softmax accumulation against a K/V block.

    q: (B, Tq, H, Dh); k/v: (B, Tk, H, Dh); kmask: (B, Tk) True=valid.
    m/l: (B, Tq, H) running max / denominator; o: (B, Tq, H, Dh).
    """
    # scores and the online-softmax state are fp32 regardless of the
    # input dtype (masked_softmax recipe, models/sanm.py): bf16 inputs
    # keep MXU-rate matmuls while the softmax math stays exact
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32)  # (B, H, Tq, Tk)
    s = jnp.where(kmask[:, None, None, :], s, NEG_INF)
    m_blk = jnp.max(s, axis=-1)                        # (B, H, Tq)
    m_new = jnp.maximum(m, m_blk.transpose(0, 2, 1))   # (B, Tq, H)
    # exp with the new max; fully-masked blocks contribute exactly zero
    p = jnp.exp(s - m_new.transpose(0, 2, 1)[..., None])
    p = jnp.where(kmask[:, None, None, :], p, 0.0)
    scale = jnp.exp(m - m_new)                         # (B, Tq, H)
    l_new = l * scale + jnp.sum(p, axis=-1).transpose(0, 2, 1)
    o_new = o * scale[..., None] + jnp.einsum(
        "bhqk,bkhd->bqhd", p.astype(v.dtype), v,
        preferred_element_type=jnp.float32)
    return m_new, l_new, o_new


def ring_self_attention(q, k, v, kmask, axis_name: str = "model"):
    """Sequence-parallel attention body; call under ``shard_map``.

    Inside the mapped function every array holds the LOCAL sequence shard:
    q/k/v: (B, T_local, H, Dh), kmask: (B, T_local) key validity.  The K/V
    (and mask) blocks rotate ``n`` times around ``axis_name``; queries stay
    put.  Returns (B, T_local, H, Dh) — the exact softmax attention output
    over the full (global) sequence, scaled by 1/sqrt(Dh).
    """
    n = jax.lax.psum(1, axis_name)
    dh = q.shape[-1]
    q = q * (dh ** -0.5)
    # initial accumulators derive from q so they carry q's varying mesh
    # axes (shard_map rejects an unvarying scan carry joined with a
    # varying output); state is fp32 (see _block)
    m = jnp.full_like(q[..., 0], NEG_INF, dtype=jnp.float32)
    l = jnp.zeros_like(q[..., 0], dtype=jnp.float32)
    o = jnp.zeros_like(q, dtype=jnp.float32)

    perm = [(i, (i + 1) % n) for i in range(n)]

    def step(carry, _):
        m, l, o, k_blk, v_blk, mask_blk = carry
        m, l, o = _block(q, k_blk, v_blk, mask_blk, m, l, o)
        # rotate K/V/mask to the next stage; the last rotation is wasted
        # but keeps the loop body uniform (XLA overlaps it with epilogue)
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        mask_blk = jax.lax.ppermute(mask_blk, axis_name, perm)
        return (m, l, o, k_blk, v_blk, mask_blk), None

    (m, l, o, _, _, _), _ = jax.lax.scan(
        step, (m, l, o, k, v, kmask), None, length=n)
    return o / jnp.maximum(l, 1e-30)[..., None]


def ring_attention_sharded(x_qkv, lengths, mesh: Mesh,
                           seq_axis: str = "model"):
    """Convenience wrapper: full ring attention over a mesh.

    ``x_qkv``: tuple of (B, T, H, Dh) arrays (already projected); ``T``
    must divide by the mesh axis size.  ``lengths``: (B,) valid frame
    counts.  Returns (B, T, H, Dh) attention output, sequence-sharded in,
    sequence-sharded out (P(None, seq_axis, None, None)).
    """
    from jax import shard_map

    q, k, v = x_qkv
    B, T, H, Dh = q.shape
    n = mesh.shape[seq_axis]
    if T % n:
        raise ValueError(f"T={T} not divisible by {seq_axis} size {n}")

    # build the key-validity mask on the host side of the shard_map so
    # each shard carries its own slice
    kmask = (jnp.arange(T)[None, :] < lengths[:, None])

    spec_x = P(None, seq_axis, None, None)
    spec_m = P(None, seq_axis)

    fn = shard_map(
        functools.partial(ring_self_attention, axis_name=seq_axis),
        mesh=mesh,
        in_specs=(spec_x, spec_x, spec_x, spec_m),
        out_specs=spec_x,
    )
    cons = lambda a, s: jax.lax.with_sharding_constraint(
        a, NamedSharding(mesh, s))
    return fn(cons(q, spec_x), cons(k, spec_x), cons(v, spec_x),
              cons(kmask, spec_m))

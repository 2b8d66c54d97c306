"""Pipeline parallelism: GPipe-style microbatch schedule over a mesh axis.

Deep scanned layer stacks (50-layer SANM encoders) can exceed one chip's
HBM at large width; the TPU-native answer is to shard the LAYER axis over
a mesh axis — each stage holds L/n layers — and stream microbatches
through the ring with ``jax.lax.ppermute``.  The schedule is GPipe
(fill/steady/drain, n_micro + n_stages - 1 ticks); activations hop one
stage per tick over ICI.

The reference has no pipeline analogue (DDP only, funasr/bin/train.py:69).
This primitive is deliberately model-agnostic: ``layer_fn(params_i, x)``
is one layer's apply; the stacked params' leading axis is the layer axis
(exactly the layout the ``nn.scan`` stacks already use), so any scanned
encoder drops in.

Exactness: the same layers run in the same order as a sequential
``lax.scan`` — the unit test checks equality to fp32 tolerance on an
8-stage CPU mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _local_stack(layer_fn, local_params, x):
    """Run x through this stage's local layers (leading axis of params)."""

    def body(h, p):
        return layer_fn(p, h), None

    y, _ = jax.lax.scan(body, x, local_params)
    return y


def pipeline_apply(layer_fn, stacked_params, x, n_micro: int, mesh: Mesh,
                   axis: str = "model"):
    """Apply an L-layer stack to ``x`` with the layer axis sharded.

    ``stacked_params``: pytree whose leaves have leading dim L (the
    ``nn.scan`` stack layout); L must divide by the mesh axis size.
    ``x``: (B, ...) with B divisible by ``n_micro``.  Returns the same
    result as ``lax.scan`` of ``layer_fn`` over all L layers.
    """
    from jax import shard_map

    n = mesh.shape[axis]
    B = x.shape[0]
    if B % n_micro:
        raise ValueError(f"batch {B} not divisible by n_micro={n_micro}")
    L = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    if L % n:
        raise ValueError(f"layers {L} not divisible by {axis} size {n}")

    micro = x.reshape(n_micro, B // n_micro, *x.shape[1:])
    ticks = n_micro + n - 1

    def staged(local_params, micro):
        stage = jax.lax.axis_index(axis)
        # a zero that VARIES over the pipe axis: shard_map's scan demands
        # carries already carry the axis the loop body introduces
        vzero = (stage * 0).astype(micro.dtype)
        buf = jnp.zeros_like(micro[0]) + vzero
        outs = jnp.zeros_like(micro) + vzero

        def tick(carry, t):
            buf, outs = carry
            # stage 0 injects microbatch t (or zeros during drain)
            inj = jnp.where(t < n_micro, t, 0)
            cur = jnp.where(stage == 0, micro[inj], buf)
            y = _local_stack(layer_fn, local_params, cur)
            # the last stage emits microbatch t-(n-1) during steady/drain
            oi = t - (n - 1)
            valid = jnp.logical_and(stage == n - 1,
                                    jnp.logical_and(oi >= 0, oi < n_micro))
            sel = jnp.logical_and(jnp.arange(n_micro) == oi, valid)
            outs = jnp.where(
                sel.reshape(n_micro, *([1] * (outs.ndim - 1))),
                y[None], outs)
            # hop activations one stage down the pipe (no wraparound)
            buf = jax.lax.ppermute(y, axis,
                                   [(i, i + 1) for i in range(n - 1)])
            return (buf, outs), None

        (_, outs), _ = jax.lax.scan(tick, (buf, outs),
                                    jnp.arange(ticks))
        # only the last stage holds real outputs (other stages hold
        # zeros): psum broadcasts the result to every stage
        mine = jnp.where(stage == n - 1, 1.0, 0.0).astype(outs.dtype)
        return jax.lax.psum(outs * mine, axis)

    # layer axis sharded over the pipe stages; microbatches replicated
    param_specs = jax.tree_util.tree_map(
        lambda a: P(axis, *([None] * (a.ndim - 1))), stacked_params)
    fn = shard_map(
        staged, mesh=mesh,
        in_specs=(param_specs, P()),
        out_specs=P(),
    )
    cons = lambda a, s: jax.lax.with_sharding_constraint(
        a, NamedSharding(mesh, s))
    stacked_params = jax.tree_util.tree_map(
        lambda a, s: cons(a, s), stacked_params, param_specs)
    out = fn(stacked_params, micro)
    return out.reshape(B, *x.shape[1:])

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
encoder drops in.  Per-example side inputs that every layer needs (the
attention length mask) ride along as ``extras``: they are microbatched
with ``x`` and each stage indexes the microbatch it is currently
processing, so the real ``EncoderLayerSANM(x, mask)`` signature fits.

Composition with data parallelism: pass ``batch_axis`` to keep the batch
dimension sharded over the dp mesh axis *inside* the pipeline (each dp
slice runs its own GPipe over the same layer shards) — no gather at the
pipeline boundary.

Exactness: the same layers run in the same order as a sequential
``lax.scan`` — the unit tests check equality to fp32 tolerance on an
8-stage CPU mesh, including on the real flagship encoder layer
(tests/test_pp_encoder.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _local_stack(layer_fn, local_params, x, extras, rng, stage, l_local):
    """Run x through this stage's local layers (leading axis of params).

    ``rng``: optional base dropout key; each layer gets
    ``fold_in(rng, global_layer_index)`` so stages draw independent,
    stage-placement-invariant streams.
    """

    def body(h, xs):
        p, li = xs
        args = (p, h) + ((extras,) if extras is not None else ())
        if rng is not None:
            gi = stage * l_local + li
            return layer_fn(*args, rng=jax.random.fold_in(rng, gi)), None
        return layer_fn(*args), None

    y, _ = jax.lax.scan(body, x, (local_params, jnp.arange(l_local)))
    return y


def pipeline_apply(layer_fn, stacked_params, x, n_micro: int, mesh: Mesh,
                   axis: str = "model", extras=None, batch_axis=None,
                   rng=None):
    """Apply an L-layer stack to ``x`` with the layer axis sharded.

    ``stacked_params``: pytree whose leaves have leading dim L (the
    ``nn.scan`` stack layout); L must divide by the mesh axis size.
    ``x``: (B, ...) with B divisible by ``n_micro``.  ``extras``: optional
    pytree of per-example arrays (leading dim B) passed to
    ``layer_fn(p, x, extras)`` — microbatched alongside ``x``.
    ``batch_axis``: optional mesh axis the batch dim stays sharded over
    (dp x pp composition).  ``rng``: optional dropout key; when given,
    ``layer_fn`` is called with a ``rng=`` kwarg folded per global layer
    index.  Returns the same result as ``lax.scan`` of ``layer_fn`` over
    all L layers.
    """
    from jax import shard_map

    n = mesh.shape[axis]
    B = x.shape[0]
    if B % n_micro:
        raise ValueError(f"batch {B} not divisible by n_micro={n_micro}")
    L = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    if L % n:
        raise ValueError(f"layers {L} not divisible by {axis} size {n}")
    l_local = L // n

    mb = B // n_micro
    micro = x.reshape(n_micro, mb, *x.shape[1:])
    micro_extras = jax.tree_util.tree_map(
        lambda a: a.reshape(n_micro, mb, *a.shape[1:]), extras)

    def staged(local_params, micro, micro_extras, rng):
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
            # the microbatch THIS stage is processing at tick t is t-stage
            # (clamped outside the fill/drain window — those results are
            # discarded, only the index must stay in range)
            mi = jnp.clip(t - stage, 0, n_micro - 1)
            ex = jax.tree_util.tree_map(lambda a: a[mi], micro_extras)
            y = _local_stack(layer_fn, local_params, cur, ex, rng,
                             stage, l_local)
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

        ticks = n_micro + n - 1
        (_, outs), _ = jax.lax.scan(tick, (buf, outs),
                                    jnp.arange(ticks))
        # only the last stage holds real outputs (other stages hold
        # zeros): psum broadcasts the result to every stage
        mine = jnp.where(stage == n - 1, 1.0, 0.0).astype(outs.dtype)
        return jax.lax.psum(outs * mine, axis)

    # layer axis sharded over the pipe stages; microbatches replicated
    # (or dp-sharded on dim 1 when batch_axis names a dp mesh axis)
    param_specs = jax.tree_util.tree_map(
        lambda a: P(axis, *([None] * (a.ndim - 1))), stacked_params)
    mspec = lambda a: P(None, batch_axis, *([None] * (a.ndim - 2)))
    micro_spec = mspec(micro)
    extras_specs = jax.tree_util.tree_map(mspec, micro_extras)
    if rng is None:
        body, rng_in = (lambda p, m, e, _r: staged(p, m, e, None)), \
            jnp.zeros((2,), jnp.uint32)
    else:
        body, rng_in = staged, rng
    # check_vma=False: the scan-transpose variance fixpoint cannot see
    # through the dwconv custom_vjp (jax 0.9 limitation — the carry for
    # the fsmn-kernel cotangent trips "mismatched varying manual axes");
    # gradient CORRECTNESS is pinned by tests/test_pp_encoder.py's exact
    # grad-parity against the single-device train step.
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(param_specs, micro_spec, extras_specs, P()),
        out_specs=micro_spec,
        check_vma=False,
    )
    cons = lambda a, s: jax.lax.with_sharding_constraint(
        a, NamedSharding(mesh, s))
    stacked_params = jax.tree_util.tree_map(
        lambda a, s: cons(a, s), stacked_params, param_specs)
    out = fn(stacked_params, micro, micro_extras, rng_in)
    return out.reshape(B, *x.shape[1:])

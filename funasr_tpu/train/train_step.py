"""Jitted training step: DP/TP-sharded forward/backward with grad-accum,
global-norm clipping, and non-finite-step skipping.

Reference semantics preserved (funasr/train_utils/trainer.py:335-476):

- loss averaged over the *global* batch (weighted DP averaging falls out of
  sharded-batch mean + psum inserted by XLA),
- ``accum_grad`` micro-batches accumulated via ``lax.scan`` before one
  optimizer step,
- grads clipped by global norm (in the optax chain),
- non-finite grad steps skipped: params/opt-state unchanged, step counter
  still advances (trainer.py:440-445).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray  # int32 scalar


def create_train_state(params, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))


def make_train_step(model, tx: optax.GradientTransformation, accum_grad: int = 1):
    """Returns ``train_step(state, batch, rng) -> (state, stats)``.

    ``batch`` = dict(speech, speech_lengths, text, text_lengths); with
    ``accum_grad > 1`` every tensor carries a leading micro-batch axis.
    The caller wraps this in jax.jit with appropriate shardings.
    """

    def loss_fn(params, micro, rng):
        drop_rng, samp_rng = jax.random.split(rng)
        loss, stats = model.apply(
            params,
            micro["speech"], micro["speech_lengths"],
            micro["text"], micro["text_lengths"],
            deterministic=False,
            rngs={"dropout": drop_rng, "sampler": samp_rng},
        )
        return loss, stats

    def compute_grads(params, batch, rng):
        if accum_grad == 1:
            (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch, rng
            )
            return grads, stats

        def micro_step(carry, xs):
            acc = carry
            micro, r = xs
            (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, micro, r
            )
            acc = jax.tree_util.tree_map(jnp.add, acc, grads)
            return acc, stats

        zero = jax.tree_util.tree_map(jnp.zeros_like, params)
        rngs = jax.random.split(rng, accum_grad)
        grads, stats = jax.lax.scan(micro_step, zero, (batch, rngs))
        grads = jax.tree_util.tree_map(lambda g: g / accum_grad, grads)
        stats = jax.tree_util.tree_map(lambda s: jnp.mean(s.astype(jnp.float32)), stats)
        return grads, stats

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray], rng):
        grads, stats = compute_grads(state.params, batch, rng)
        gnorm = optax.global_norm(grads)
        finite = jnp.isfinite(gnorm)
        safe_grads = jax.tree_util.tree_map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads
        )
        updates, new_opt = tx.update(safe_grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        # skip the whole step on non-finite grads
        new_params = jax.tree_util.tree_map(
            lambda n, o: jnp.where(finite, n, o), new_params, state.params
        )
        new_opt = jax.tree_util.tree_map(
            lambda n, o: jnp.where(finite, n, o) if isinstance(n, jnp.ndarray) and n.shape == o.shape else n,
            new_opt, state.opt_state,
        )
        stats = dict(stats)
        stats["grad_norm"] = gnorm
        stats["finite"] = finite.astype(jnp.float32)
        return TrainState(new_params, new_opt, state.step + 1), stats

    return train_step

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
    params: Any  # trainable variables (the 'params' collection)
    opt_state: Any
    step: jnp.ndarray  # int32 scalar
    model_state: Any = None  # non-trainable collections (e.g. batch_stats)


def create_train_state(params, tx: optax.GradientTransformation,
                       model_state=None) -> TrainState:
    return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32),
                      model_state)


def make_train_step(model, tx: optax.GradientTransformation, accum_grad: int = 1,
                    mutable_collections: Tuple[str, ...] = ()):
    """Returns ``train_step(state, batch, rng) -> (state, stats)``.

    ``batch`` = dict(speech, speech_lengths, text, text_lengths); with
    ``accum_grad > 1`` every tensor carries a leading micro-batch axis.
    ``mutable_collections`` (e.g. ("batch_stats",) for Conformer BatchNorm)
    are threaded through ``state.model_state`` and updated each step.
    The caller wraps this in jax.jit with appropriate shardings.
    """

    def loss_fn(params, model_state, micro, rng):
        drop_rng, samp_rng = jax.random.split(rng)
        variables = dict(params)
        if model_state:
            variables.update(model_state)
        kw = {}
        if mutable_collections:
            kw["mutable"] = list(mutable_collections)
        out = model.apply(
            variables,
            micro["speech"], micro["speech_lengths"],
            micro["text"], micro["text_lengths"],
            deterministic=False,
            rngs={"dropout": drop_rng, "sampler": samp_rng},
            **kw,
        )
        if mutable_collections:
            (loss, stats), updates = out
            stats = dict(stats)
            stats["__model_state__"] = dict(updates)
        else:
            loss, stats = out
        return loss, stats

    def compute_grads(params, model_state, batch, rng):
        if accum_grad == 1:
            (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, model_state, batch, rng
            )
            return grads, stats

        def micro_step(carry, xs):
            acc, mstate = carry
            micro, r = xs
            (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, mstate, micro, r
            )
            acc = jax.tree_util.tree_map(jnp.add, acc, grads)
            mstate = stats.pop("__model_state__", mstate) if isinstance(stats, dict) else mstate
            return (acc, mstate), stats

        zero = jax.tree_util.tree_map(jnp.zeros_like, params)
        rngs = jax.random.split(rng, accum_grad)
        (grads, mstate), stats = jax.lax.scan(
            micro_step, (zero, model_state), (batch, rngs)
        )
        grads = jax.tree_util.tree_map(lambda g: g / accum_grad, grads)
        stats = jax.tree_util.tree_map(lambda s: jnp.mean(s.astype(jnp.float32)), stats)
        if mutable_collections:
            stats["__model_state__"] = mstate
        return grads, stats

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray], rng):
        grads, stats = compute_grads(state.params, state.model_state, batch, rng)
        stats = dict(stats)
        new_model_state = stats.pop("__model_state__", state.model_state)
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
        stats["grad_norm"] = gnorm
        stats["finite"] = finite.astype(jnp.float32)
        return TrainState(new_params, new_opt, state.step + 1,
                          new_model_state), stats

    return train_step

"""Gradient accumulation: accum_grad=2 over split micro-batches ~= one step
on the concatenated batch (same grads up to averaging order)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from funasr_tpu.models.paraformer.model import Paraformer
from funasr_tpu.train.optim import build_optimizer
from funasr_tpu.train.train_step import TrainState, make_train_step

CONF = dict(
    vocab_size=24,
    input_size=12,
    encoder_conf=dict(output_size=16, attention_heads=2, linear_units=32,
                      num_blocks=2, dropout_rate=0.0, kernel_size=3),
    decoder_conf=dict(attention_heads=2, linear_units=32, num_blocks=1,
                      att_layer_num=1, kernel_size=3, dropout_rate=0.0),
    predictor_conf=dict(idim=16, tail_threshold=0.45, dropout=0.0),
    sampling_ratio=0.0,  # deterministic loss (no GLM randomness)
)


def test_accum_grad_matches_full_batch(rng):
    model = Paraformer(**CONF)
    B, T, U = 4, 20, 5
    batch = dict(
        speech=jnp.asarray(rng.standard_normal((B, T, 12)), jnp.float32),
        speech_lengths=jnp.full((B,), T, jnp.int32),
        text=jnp.asarray(rng.integers(3, 24, (B, U)), jnp.int32),
        text_lengths=jnp.full((B,), U, jnp.int32),
    )
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "dropout": key, "sampler": key},
                        batch["speech"], batch["speech_lengths"],
                        batch["text"], batch["text_lengths"])
    tx, _ = build_optimizer("sgd", {"lr": 1e-2}, "constant", {}, grad_clip=0)

    # full batch, 1 step
    step1 = jax.jit(make_train_step(model, tx))
    s1 = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    s1, stats1 = step1(s1, batch, jax.random.PRNGKey(1))

    # micro-batches with accum: leading axis (2, B/2, ...)
    micro = jax.tree_util.tree_map(
        lambda x: x.reshape(2, B // 2, *x.shape[1:]), batch)
    step2 = jax.jit(make_train_step(model, tx, accum_grad=2))
    s2 = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    s2, stats2 = step2(s2, micro, jax.random.PRNGKey(1))

    # both losses finite; parameters close (batch-mean vs micro-mean of the
    # length-normalized loss differ only by per-micro weighting)
    d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), s1.params, s2.params)
    assert max(jax.tree_util.tree_leaves(d)) < 5e-3
    assert np.isfinite(float(stats2["loss"]))

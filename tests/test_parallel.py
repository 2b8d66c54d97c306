"""Sharded training/inference over the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from funasr_tpu.models.paraformer.model import Paraformer
from funasr_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_shardings,
    replicated,
)
from funasr_tpu.train.optim import build_optimizer
from funasr_tpu.train.train_step import TrainState, create_train_state, make_train_step

CONF = dict(
    vocab_size=64,
    input_size=24,
    encoder_conf=dict(output_size=16, attention_heads=2, linear_units=64,
                      num_blocks=3, dropout_rate=0.0, kernel_size=5),
    decoder_conf=dict(attention_heads=2, linear_units=64, num_blocks=2,
                      att_layer_num=2, kernel_size=5, dropout_rate=0.0),
    predictor_conf=dict(idim=16, tail_threshold=0.45, dropout=0.0),
    sampling_ratio=0.75,
)


def _batch(rng, B=8, T=40, U=8):
    speech = jnp.asarray(rng.standard_normal((B, T, CONF["input_size"])), jnp.float32)
    speech_lengths = jnp.asarray(rng.integers(T // 2, T + 1, size=(B,)), jnp.int32)
    text = jnp.asarray(rng.integers(3, CONF["vocab_size"], size=(B, U)), jnp.int32)
    text_lengths = jnp.asarray(rng.integers(2, U + 1, size=(B,)), jnp.int32)
    text = jnp.where(jnp.arange(U)[None] < text_lengths[:, None], text, -1)
    return dict(speech=speech, speech_lengths=speech_lengths,
                text=text, text_lengths=text_lengths)


def test_dp_tp_train_step(rng):
    assert len(jax.devices()) == 8
    mesh = make_mesh(data=4, model=2)
    model = Paraformer(**CONF)
    batch = _batch(rng)

    key = jax.random.PRNGKey(0)
    params = model.init(
        {"params": key, "dropout": key, "sampler": key},
        batch["speech"], batch["speech_lengths"],
        batch["text"], batch["text_lengths"],
    )
    params = jax.device_put(params, param_shardings(params, mesh))
    tx, _ = build_optimizer("adam", {"lr": 1e-3}, "warmuplr",
                            {"warmup_steps": 100}, grad_clip=5.0)
    from funasr_tpu.parallel.mesh import init_sharded_opt_state
    opt_state = init_sharded_opt_state(tx, params, mesh)
    state = TrainState(params, opt_state, jnp.zeros((), jnp.int32))

    batch = jax.device_put(batch, batch_sharding(mesh))
    train_step = jax.jit(make_train_step(model, tx))
    new_state, stats = train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(stats["loss"]))
    assert float(stats["finite"]) == 1.0
    # params actually moved
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state.params, new_state.params
    )
    assert max(jax.tree_util.tree_leaves(diff)) > 0

    # second step reuses the compiled program
    newer, stats2 = train_step(new_state, batch, jax.random.PRNGKey(2))
    assert int(newer.step) == 2


def test_dp_inference_matches_single_device(rng):
    mesh = make_mesh(data=8, model=1)
    model = Paraformer(**CONF)
    batch = _batch(rng)
    key = jax.random.PRNGKey(0)
    params = model.init(
        {"params": key, "dropout": key, "sampler": key},
        batch["speech"], batch["speech_lengths"],
        batch["text"], batch["text_lengths"],
    )
    tokens_1, lens_1, _ = model.apply(
        params, batch["speech"], batch["speech_lengths"], max_tokens=16,
        method=model.greedy_decode,
    )
    params_s = jax.device_put(params, param_shardings(params, mesh))
    speech_s = jax.device_put(batch["speech"], batch_sharding(mesh))
    slens_s = jax.device_put(batch["speech_lengths"], batch_sharding(mesh))
    tokens_8, lens_8, _ = jax.jit(
        lambda p, s, sl: model.apply(p, s, sl, max_tokens=16,
                                     method=model.greedy_decode)
    )(params_s, speech_s, slens_s)
    np.testing.assert_array_equal(np.asarray(tokens_1), np.asarray(tokens_8))
    np.testing.assert_array_equal(np.asarray(lens_1), np.asarray(lens_8))


def test_param_sharding_rules():
    mesh = make_mesh(data=4, model=2)
    model = Paraformer(**CONF)
    key = jax.random.PRNGKey(0)
    speech = jnp.zeros((2, 20, CONF["input_size"]))
    slens = jnp.array([20, 20])
    text = jnp.zeros((2, 4), jnp.int32)
    tlens = jnp.array([4, 4])
    params = model.init({"params": key, "dropout": key, "sampler": key},
                        speech, slens, text, tlens)
    shardings = param_shardings(params, mesh)
    flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
    model_sharded = [
        "/".join(str(getattr(k, "key", k)) for k in kp)
        for kp, s in flat
        if "model" in str(s.spec)
    ]
    # FFN + attention projections must be model-sharded
    assert any("w_1" in p for p in model_sharded)
    assert any("linear_q_k_v" in p for p in model_sharded)
    assert any("output_layer" in p for p in model_sharded)


def test_fsdp_param_sharding_train_step(rng):
    """fsdp=True (ZeRO/FSDP equivalent): big params shard a free dim over
    the data axis; the train step still runs and matches DP loss."""
    mesh = make_mesh(data=4, model=2)
    model = Paraformer(**CONF)
    batch = _batch(rng)
    key = jax.random.PRNGKey(0)
    params = model.init(
        {"params": key, "dropout": key, "sampler": key},
        batch["speech"], batch["speech_lengths"],
        batch["text"], batch["text_lengths"],
    )
    sh = param_shardings(params, mesh, fsdp=True, fsdp_min_size=256)
    flat = jax.tree_util.tree_flatten_with_path(sh)[0]
    data_sharded = [kp for kp, s in flat if "data" in str(s.spec)]
    assert data_sharded, "no param picked up a data-axis shard"
    # small leaves (biases under min_size) stay off the data axis
    leaves = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    for kp, s in flat:
        if leaves[kp].size < 256:
            assert "data" not in str(s.spec)

    params_f = jax.device_put(params, sh)
    tx, _ = build_optimizer("adam", {"lr": 1e-3}, "warmuplr",
                            {"warmup_steps": 100}, grad_clip=5.0)
    from funasr_tpu.parallel.mesh import init_sharded_opt_state
    opt_state = init_sharded_opt_state(tx, params_f, mesh)
    state = TrainState(params_f, opt_state, jnp.zeros((), jnp.int32))
    batch_s = jax.device_put(batch, batch_sharding(mesh))
    train_step = jax.jit(make_train_step(model, tx))
    new_state, stats = train_step(state, batch_s, jax.random.PRNGKey(1))
    assert np.isfinite(float(stats["loss"]))

    # loss identical to the non-fsdp layout (same math, different layout)
    params_r = jax.device_put(params, param_shardings(params, mesh))
    opt_r = init_sharded_opt_state(tx, params_r, mesh)
    state_r = TrainState(params_r, opt_r, jnp.zeros((), jnp.int32))
    _, stats_r = train_step(state_r, batch_s, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(stats["loss"]), float(stats_r["loss"]),
                               rtol=2e-5)

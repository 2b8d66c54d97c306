"""Trainer loop: overfit a tiny batch, checkpoint, resume, n-best average."""

import logging

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from funasr_tpu.models.paraformer.model import Paraformer
from funasr_tpu.train.checkpoint import CheckpointManager
from funasr_tpu.train.optim import (
    build_optimizer,
    tri_stage_schedule,
    warmup_lr_schedule,
)
from funasr_tpu.train.train_step import TrainState, make_train_step
from funasr_tpu.train.trainer import Trainer

CONF = dict(
    vocab_size=32,
    input_size=12,
    encoder_conf=dict(output_size=16, attention_heads=2, linear_units=32,
                      num_blocks=2, dropout_rate=0.0, kernel_size=3),
    decoder_conf=dict(attention_heads=2, linear_units=32, num_blocks=1,
                      att_layer_num=1, kernel_size=3, dropout_rate=0.0),
    predictor_conf=dict(idim=16, tail_threshold=0.45, dropout=0.0),
    sampling_ratio=0.5,
)


def _fixed_batch(rng):
    B, T, U = 4, 24, 5
    return dict(
        speech=jnp.asarray(rng.standard_normal((B, T, 12)), jnp.float32),
        speech_lengths=jnp.full((B,), T, jnp.int32),
        text=jnp.asarray(rng.integers(3, 32, (B, U)), jnp.int32),
        text_lengths=jnp.full((B,), U, jnp.int32),
    )


def test_schedules():
    s = warmup_lr_schedule(1.0, warmup_steps=100)
    assert float(s(1)) < float(s(50)) < float(s(100))
    assert float(s(100)) > float(s(400))
    t = tri_stage_schedule(1.0, (0.1, 0.4, 0.5), total_steps=100)
    assert float(t(0)) == pytest.approx(0.01)
    assert float(t(10)) == pytest.approx(1.0)
    assert float(t(30)) == pytest.approx(1.0)
    assert float(t(100)) == pytest.approx(0.01, rel=1e-3)


def test_overfit_loss_decreases(rng):
    model = Paraformer(**CONF)
    batch = _fixed_batch(rng)
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "dropout": key, "sampler": key},
                        batch["speech"], batch["speech_lengths"],
                        batch["text"], batch["text_lengths"])
    tx, _ = build_optimizer("adam", {"lr": 3e-3}, "constant", {}, grad_clip=5.0)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step = jax.jit(make_train_step(model, tx))
    losses = []
    for i in range(30):
        state, stats = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(stats["loss"]))
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.7, losses


def test_checkpoint_roundtrip_and_resume(tmp_path, rng):
    model = Paraformer(**CONF)
    batch = _fixed_batch(rng)
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "dropout": key, "sampler": key},
                        batch["speech"], batch["speech_lengths"],
                        batch["text"], batch["text_lengths"])
    tx, _ = build_optimizer("adam", {"lr": 1e-3}, "constant", {})
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step = jax.jit(make_train_step(model, tx))

    ckpt = CheckpointManager(str(tmp_path / "ckpt"), keep_nbest=2, metric="acc")
    accs = [0.1, 0.5, 0.3, 0.7]
    for i, a in enumerate(accs):
        state, _ = step(state, batch, jax.random.PRNGKey(i))
        ckpt.save(int(state.step), state._asdict(),
                  extra={"epoch": 0, "step_in_epoch": i + 1}, val_metric=a)

    # keep_nbest=2 -> only the two best validation scores survive
    assert sorted(ckpt._scores.values()) == [0.5, 0.7]
    assert ckpt.best_step() == 4

    payload = ckpt.restore(ckpt.best_step())
    restored = payload["state"]
    np.testing.assert_array_equal(np.asarray(restored["step"]), 4)

    avg = ckpt.average_nbest(2, params_of=lambda p: p["state"]["params"])
    leaves = jax.tree_util.tree_leaves(avg)
    assert all(np.isfinite(l).all() for l in leaves)


def test_trainer_loop_runs(tmp_path, rng, caplog):
    model = Paraformer(**CONF)
    batch = _fixed_batch(rng)
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "dropout": key, "sampler": key},
                        batch["speech"], batch["speech_lengths"],
                        batch["text"], batch["text_lengths"])
    tx, _ = build_optimizer("adam", {"lr": 1e-3}, "constant", {})
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step = jax.jit(make_train_step(model, tx))

    def eval_step(params, b):
        loss, stats = model.apply(params, b["speech"], b["speech_lengths"],
                                  b["text"], b["text_lengths"],
                                  deterministic=True)
        return {"loss": loss, "acc": stats["acc"]}

    ckpt = CheckpointManager(str(tmp_path / "ck"), keep_nbest=3)
    trainer = Trainer(step, eval_step, ckpt, max_epoch=2,
                      save_checkpoint_interval=3, log_interval=2)

    def build_iter(epoch, start_step):
        return [batch] * (4 - start_step)

    state = trainer.run(state, build_iter, valid_iter=lambda: [batch])
    assert int(state.step) == 8
    assert ckpt.latest_step() is not None

    # resume: fresh trainer picks up epoch/step from the checkpoint
    trainer2 = Trainer(step, eval_step, ckpt, max_epoch=2,
                       save_checkpoint_interval=100)
    state2 = trainer2.resume(
        TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    )
    assert int(state2["step"] if isinstance(state2, dict) else state2.step) == 8
    assert trainer2.start_epoch == 2


def test_checkpoint_latest_survives_prune(tmp_path, rng):
    """A newest checkpoint with the worst validation score must survive
    pruning (it is the resume point), like the reference's separate
    model.pt; unscored older steps are pruned for bounded disk."""
    model = Paraformer(**CONF)
    batch = _fixed_batch(rng)
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "dropout": key, "sampler": key},
                        batch["speech"], batch["speech_lengths"],
                        batch["text"], batch["text_lengths"])
    tx, _ = build_optimizer("adam", {"lr": 1e-3}, "constant", {})
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step = jax.jit(make_train_step(model, tx))

    ckpt = CheckpointManager(str(tmp_path / "ckpt"), keep_nbest=2,
                             metric="acc")
    # three good saves, then the newest with the WORST score
    for i, a in enumerate([0.5, 0.6, 0.7, 0.1]):
        state, _ = step(state, batch, jax.random.PRNGKey(i))
        ckpt.save(int(state.step), state._asdict(), val_metric=a)
    assert ckpt.latest_step() == 4          # resume point kept
    steps = set(ckpt._mgr.all_steps())
    assert steps == {2, 3, 4}               # 2 best (0.6, 0.7) + latest
    assert ckpt.best_step() == 3


def test_trainer_epoch_boundary_save_collision(tmp_path, rng):
    """Epoch length divisible by save_checkpoint_interval: the interval
    save and the epoch-boundary save hit the same step — must not raise."""
    model = Paraformer(**CONF)
    batch = _fixed_batch(rng)
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "dropout": key, "sampler": key},
                        batch["speech"], batch["speech_lengths"],
                        batch["text"], batch["text_lengths"])
    tx, _ = build_optimizer("adam", {"lr": 1e-3}, "constant", {})
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step = jax.jit(make_train_step(model, tx))
    ckpt = CheckpointManager(str(tmp_path / "ck"), keep_nbest=3)
    trainer = Trainer(step, None, ckpt, max_epoch=2,
                      save_checkpoint_interval=3, log_interval=10)

    def build_iter(epoch, start_step):
        return [batch] * (3 - start_step)  # 3 batches/epoch == interval

    state = trainer.run(state, build_iter, valid_iter=None)
    assert int(state.step) == 6
    assert ckpt.latest_step() == 6


def test_validate_interval_runs_independently(rng):
    """Regression: validate_interval must trigger validation on its own
    interval (reference trainer.py:497), not only at checkpoint saves."""
    model = Paraformer(**CONF)
    batch = _fixed_batch(rng)
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "dropout": key, "sampler": key},
                        batch["speech"], batch["speech_lengths"],
                        batch["text"], batch["text_lengths"])
    tx, _ = build_optimizer("adam", {"lr": 1e-3}, "constant", {})
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step = jax.jit(make_train_step(model, tx))

    calls = []

    def eval_step(params, b):
        calls.append(1)
        return {"acc": jnp.zeros(())}

    trainer = Trainer(step, eval_step, checkpoint_manager=None,
                      max_epoch=1, validate_interval=2,
                      save_checkpoint_interval=10**6, log_interval=10**6)
    trainer.run(state, lambda e, s: [batch] * 5,
                valid_iter=lambda: [batch])
    # 5 steps, interval 2 -> validations at steps 2 and 4
    assert len(calls) == 2


def test_iter_split_batches_covers_dataset():
    """data_split_num slices re-batch to full shapes and cover every
    index exactly once per epoch."""
    from funasr_tpu.bin.train import iter_split_batches
    from funasr_tpu.datasets.samplers import DynamicBatchSampler

    n = 10
    lens = [100 + 10 * i for i in range(n)]
    sampler = DynamicBatchSampler(lens, lens, batch_type="example",
                                  batch_size=3, shuffle=False)

    plain = list(iter_split_batches(sampler, n, 1, epoch=0))
    seen = [i for idx, _, _ in plain for i in idx]
    assert sorted(seen) == list(range(n))

    split = list(iter_split_batches(sampler, n, 2, epoch=0))
    seen2 = [i for idx, _, _ in split for i in idx]
    assert sorted(seen2) == list(range(n))
    # first half of the epoch only touches the first slice
    first_half = [i for idx, _, _ in split[: len(split) // 2] for i in idx]
    assert all(i < 5 for i in first_half)
    # batches are re-packed to full batch shapes within each slice
    assert max(len(idx) for idx, _, _ in split) == 3


def test_iter_split_batches_resume_and_pad_lens():
    """Regressions: start_step skips emitted batches of the EPOCH (not
    per slice), and each emitted batch pads to the max of ITS OWN items
    (not a slice-running max)."""
    from funasr_tpu.bin.train import iter_split_batches
    from funasr_tpu.datasets.samplers import DynamicBatchSampler

    n = 12
    lens = [50 + 10 * i for i in range(n)]
    sampler = DynamicBatchSampler(lens, lens, batch_type="example",
                                  batch_size=3, shuffle=False)
    full = list(iter_split_batches(sampler, n, 3, epoch=0))
    resumed = list(iter_split_batches(sampler, n, 3, epoch=0,
                                      start_step=2))
    assert [i for b in resumed for i in b[0]] \
        == [i for b in full[2:] for i in b[0]]

    # pad lens per emitted batch: later short batches must not inherit
    # an earlier long batch's pad length (old code kept a slice-running
    # max). With DESCENDING lengths, the later batch in a slice must pad
    # to its own (smaller) bucket length.
    lens_d = [170 - 10 * i for i in range(n)]
    sampler_d = DynamicBatchSampler(lens_d, lens_d, batch_type="example",
                                    batch_size=3, shuffle=False)
    out = list(iter_split_batches(sampler_d, n, 2, epoch=0))
    for idx, ps, _pt in out:
        own = max(lens_d[i] for i in idx)
        assert ps <= own + 60  # not the global max of the slice prefix
    pads = [ps for _, ps, _ in out]
    assert pads != sorted(pads), "descending data must yield " \
        "non-increasing pads, not a running max"

"""Trainer: epoch/step loop with validation, checkpointing, resume.

Reference contract (funasr/train_utils/trainer.py:33): per-epoch batch loop
with grad-accum, validate every ``validate_interval`` steps, checkpoint
every ``save_checkpoint_interval`` steps, keep-nbest pruning by validation
metric, mid-epoch resume via the sampler's ``start_step``, and final n-best
averaging.

TPU design: one jitted ``train_step`` (already DP/TP-sharded by the caller's
mesh) is fed host-side batches from the bucketed sampler; bucket shape
quantization bounds recompiles; device work is async (dispatch-ahead) with a
blocking sync only at log boundaries.
"""

from __future__ import annotations

import logging
import time
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from funasr_tpu.train.train_step import TrainState

log = logging.getLogger(__name__)


class Trainer:
    def __init__(
        self,
        train_step: Callable,  # (state, batch, rng) -> (state, stats)
        eval_step: Optional[Callable] = None,  # (params, batch) -> stats
        checkpoint_manager=None,
        max_epoch: int = 100,
        validate_interval: int = 5000,
        save_checkpoint_interval: int = 5000,
        log_interval: int = 50,
        metric: str = "acc",
        seed: int = 0,
        metrics_logger=None,  # funasr_tpu.utils.observability.MetricsLogger
    ):
        self.train_step = train_step
        self.eval_step = eval_step
        self.ckpt = checkpoint_manager
        self.max_epoch = max_epoch
        self.validate_interval = validate_interval
        self.save_checkpoint_interval = save_checkpoint_interval
        self.log_interval = log_interval
        self.metric = metric
        self.seed = seed
        self.metrics_logger = metrics_logger
        self.start_epoch = 0
        self.start_step = 0

    # ------------------------------------------------------------- resume
    def resume(self, state: TrainState) -> TrainState:
        if self.ckpt is None:
            return state
        latest = self.ckpt.latest_step()
        if latest is None:
            return state
        payload = self.ckpt.restore(latest, template={"state": state, "extra": {
            "epoch": 0, "step_in_epoch": 0}})
        restored = payload["state"]
        extra = payload.get("extra", {})
        self.start_epoch = int(extra.get("epoch", 0))
        self.start_step = int(extra.get("step_in_epoch", 0))
        log.info("resumed from step %s (epoch %d, step-in-epoch %d)",
                 latest, self.start_epoch, self.start_step)
        return restored

    # -------------------------------------------------------------- train
    def run(
        self,
        state: TrainState,
        build_iter: Callable[[int, int], Iterable[Dict[str, Any]]],
        valid_iter: Optional[Callable[[], Iterable[Dict[str, Any]]]] = None,
    ) -> TrainState:
        from funasr_tpu.utils.observability import SpeedStats

        rng = jax.random.PRNGKey(self.seed)
        speed = SpeedStats()
        last_val_step, val = -1, None
        for epoch in range(self.start_epoch, self.max_epoch):
            step_in_epoch = self.start_step if epoch == self.start_epoch else 0
            t_last = time.time()
            for batch in build_iter(epoch, step_in_epoch):
                speed.data_tick()
                rng, step_rng = jax.random.split(rng)
                state, stats = self.train_step(state, batch, step_rng)
                speed.step_tick()
                step_in_epoch += 1
                gstep = int(state.step)
                if gstep % self.log_interval == 0:
                    stats = {k: float(v) for k, v in stats.items()}
                    dt = (time.time() - t_last) / self.log_interval
                    t_last = time.time()
                    stats.update(speed.flush())
                    log.info(
                        "epoch %d step %d loss %.4f acc %.4f gnorm %.2f %.3fs/step"
                        " (data %.3fs step %.3fs)",
                        epoch, gstep, stats.get("loss", float("nan")),
                        stats.get("acc", float("nan")),
                        stats.get("grad_norm", float("nan")), dt,
                        stats.get("data_load_s", 0.0),
                        stats.get("step_s", 0.0),
                    )
                    if self.metrics_logger is not None:
                        self.metrics_logger.log(gstep, stats)
                # validation runs on its OWN interval (reference
                # trainer.py:497), independent of checkpointing
                if (
                    self.validate_interval
                    and gstep % self.validate_interval == 0
                ):
                    val = self._validate(state, valid_iter)
                    last_val_step = gstep
                if (
                    self.ckpt is not None
                    and gstep % self.save_checkpoint_interval == 0
                ):
                    if last_val_step != gstep:
                        val = self._validate(state, valid_iter)
                        last_val_step = gstep
                    self.ckpt.save(
                        gstep, state._asdict(),
                        extra={"epoch": epoch, "step_in_epoch": step_in_epoch},
                        val_metric=val,
                    )
            # epoch boundary: validate + checkpoint
            if self.ckpt is not None:
                val = self._validate(state, valid_iter)
                self.ckpt.save(
                    int(state.step), state._asdict(),
                    extra={"epoch": epoch + 1, "step_in_epoch": 0},
                    val_metric=val,
                )
        return state

    def _validate(self, state: TrainState, valid_iter) -> Optional[float]:
        if self.eval_step is None or valid_iter is None:
            return None
        totals: Dict[str, float] = {}
        n = 0
        for batch in valid_iter():
            stats = self.eval_step(state.params, batch)
            for k, v in stats.items():
                totals[k] = totals.get(k, 0.0) + float(v)
            n += 1
        if n == 0:
            return None
        avg = {k: v / n for k, v in totals.items()}
        log.info("validation: %s", avg)
        if self.metrics_logger is not None:
            self.metrics_logger.log(int(state.step), avg, prefix="valid")
        return avg.get(self.metric)

"""Observability: metrics logging, per-stage speed stats, profiler hooks.

Reference parity (SURVEY §5): the reference logs per-step
``speed_stats`` (data_load/forward/backward/optim wall times,
trainer.py:361-476), tensorboard scalars per rank, optional wandb, and
GPU memory per log interval.  TPU equivalents here:

- ``MetricsLogger`` — tensorboard (torch.utils.tensorboard) and/or wandb
  when available/configured, no-op otherwise;
- ``SpeedStats`` — data-load vs device-step wall split.  Under jit the
  whole fwd/bwd/optim is ONE async dispatch, so the meaningful split on
  TPU is host data time vs device step time (plus blocking sync at log
  boundaries);
- ``profiler_trace`` — context manager around ``jax.profiler`` for
  on-demand device traces (open in TensorBoard / Perfetto);
- ``device_memory_stats`` — per-device HBM usage when the backend
  exposes it.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Dict, Optional

import jax


class MetricsLogger:
    def __init__(self, tensorboard_dir: Optional[str] = None,
                 use_wandb: bool = False, wandb_kwargs: Optional[Dict] = None):
        self.tb = None
        self.wandb = None
        if tensorboard_dir:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.tb = SummaryWriter(tensorboard_dir)
            except Exception:  # noqa: BLE001 - optional dependency surface
                self.tb = None
        if use_wandb:
            try:
                import wandb

                wandb.init(**(wandb_kwargs or {}))
                self.wandb = wandb
            except Exception:  # noqa: BLE001
                self.wandb = None

    def log(self, step: int, scalars: Dict[str, Any], prefix: str = "train"):
        if self.tb is not None:
            for k, v in scalars.items():
                try:
                    self.tb.add_scalar(f"{prefix}/{k}", float(v), step)
                except (TypeError, ValueError):
                    pass
        if self.wandb is not None:
            self.wandb.log({f"{prefix}/{k}": v for k, v in scalars.items()},
                           step=step)

    def close(self):
        if self.tb is not None:
            self.tb.close()
        if self.wandb is not None:
            self.wandb.finish()


class SpeedStats:
    """Accumulates host data time vs device step time between flushes."""

    def __init__(self):
        self.reset()
        self._t = time.time()

    def reset(self):
        self.data_s = 0.0
        self.step_s = 0.0
        self.n = 0

    def data_tick(self):
        """Call right after the next batch is available."""
        now = time.time()
        self.data_s += now - self._t
        self._t = now

    def step_tick(self):
        """Call right after the train_step dispatch returns."""
        now = time.time()
        self.step_s += now - self._t
        self._t = now
        self.n += 1

    def flush(self) -> Dict[str, float]:
        n = max(self.n, 1)
        out = {"data_load_s": self.data_s / n, "step_s": self.step_s / n}
        self.reset()
        return out


@contextlib.contextmanager
def profiler_trace(logdir: str):
    """Device trace for TensorBoard/Perfetto (jax.profiler)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> Dict[str, Dict[str, int]]:
    out: Dict[str, Dict[str, int]] = {}
    for d in jax.local_devices():
        try:
            ms = d.memory_stats()
        except Exception:  # noqa: BLE001 - CPU backend has none
            ms = None
        if ms:
            out[str(d)] = {k: int(v) for k, v in ms.items()
                           if isinstance(v, (int, float))}
    return out

"""Optimizers + LR schedulers (reference funasr/optimizers/__init__.py:5,
funasr/schedulers/{warmup_lr,noam_lr,tri_stage_scheduler}.py) on optax.

Schedules are expressed as optax schedules (step -> lr multiplier applied to
the base lr), matching the reference's formulas:

- warmuplr (warmup_lr.py:11): ``lr * warmup^0.5 * min(step^-0.5,
  step * warmup^-1.5)``
- noamlr (noam_lr.py:12): ``lr * d^-0.5 * min(step^-0.5, step*warmup^-1.5)``
- tri_stage (tri_stage_scheduler.py:15): linear warmup to peak, hold, then
  exponential decay to ``final_lr_scale``.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import optax


def warmup_lr_schedule(lr: float, warmup_steps: int = 25000):
    def schedule(step):
        s = jnp.maximum(step.astype(jnp.float32) if hasattr(step, "astype") else float(step), 1.0)
        return lr * warmup_steps**0.5 * jnp.minimum(s**-0.5, s * warmup_steps**-1.5)

    return schedule


def noam_lr_schedule(lr: float, model_size: int = 320, warmup_steps: int = 25000):
    def schedule(step):
        s = jnp.maximum(jnp.asarray(step, jnp.float32), 1.0)
        return lr * model_size**-0.5 * jnp.minimum(s**-0.5, s * warmup_steps**-1.5)

    return schedule


def tri_stage_schedule(
    lr: float,
    phase_ratio=(0.1, 0.4, 0.5),
    total_steps: int = 100000,
    init_lr_scale: float = 0.01,
    final_lr_scale: float = 0.01,
):
    w = int(phase_ratio[0] * total_steps)
    h = int(phase_ratio[1] * total_steps)
    d = int(phase_ratio[2] * total_steps)

    def schedule(step):
        s = jnp.asarray(step, jnp.float32)
        warm = lr * (init_lr_scale + (1 - init_lr_scale) * jnp.minimum(s / max(w, 1), 1.0))
        decay_frac = jnp.clip((s - w - h) / max(d, 1), 0.0, 1.0)
        decay = lr * jnp.exp(jnp.log(final_lr_scale) * decay_frac)
        return jnp.where(s < w, warm, jnp.where(s < w + h, lr, decay))

    return schedule


SCHEDULER_BUILDERS = {
    "warmuplr": lambda lr, conf: warmup_lr_schedule(
        lr, conf.get("warmup_steps", 25000)
    ),
    "noamlr": lambda lr, conf: noam_lr_schedule(
        lr, conf.get("model_size", 320), conf.get("warmup_steps", 25000)
    ),
    "tri_stage": lambda lr, conf: tri_stage_schedule(
        lr,
        conf.get("phase_ratio", (0.1, 0.4, 0.5)),
        conf.get("total_steps", 100000),
        conf.get("init_lr_scale", 0.01),
        conf.get("final_lr_scale", 0.01),
    ),
    "constant": lambda lr, conf: optax.constant_schedule(lr),
}


def build_optimizer(
    optim: str = "adam",
    optim_conf: Dict[str, Any] | None = None,
    scheduler: str = "warmuplr",
    scheduler_conf: Dict[str, Any] | None = None,
    grad_clip: float = 5.0,
) -> optax.GradientTransformation:
    """Build the optax chain: clip-by-global-norm -> optimizer(schedule).

    Non-finite-grad steps are skipped by the trainer (reference
    trainer.py:440-445), not here.
    """
    optim_conf = dict(optim_conf or {})
    lr = float(optim_conf.pop("lr", 1e-3))
    schedule = SCHEDULER_BUILDERS[scheduler](lr, dict(scheduler_conf or {}))

    if optim in ("adam", "fairseq_adam"):
        tx = optax.adam(schedule, **optim_conf)
    elif optim == "adamw":
        tx = optax.adamw(schedule, **optim_conf)
    elif optim == "sgd":
        tx = optax.sgd(schedule, **optim_conf)
    else:
        raise KeyError(f"unknown optimizer {optim!r}")

    chain = [tx]
    if grad_clip and grad_clip > 0:
        chain = [optax.clip_by_global_norm(grad_clip)] + chain
    return optax.chain(*chain), schedule

"""Metrics logger, speed stats, profiler trace."""

import os
import time

import pytest

from funasr_tpu.utils.observability import (
    MetricsLogger,
    SpeedStats,
    device_memory_stats,
    profiler_trace,
)


def test_metrics_logger_tensorboard(tmp_path):
    ml = MetricsLogger(tensorboard_dir=str(tmp_path))
    ml.log(1, {"loss": 1.5, "acc": 0.5})
    ml.log(2, {"loss": 1.2, "acc": "not-a-number"})  # ignored gracefully
    ml.close()
    files = os.listdir(tmp_path)
    assert any("tfevents" in f for f in files)


def test_metrics_logger_noop():
    ml = MetricsLogger()
    ml.log(1, {"loss": 1.0})  # no backend, no crash
    ml.close()


def test_speed_stats():
    s = SpeedStats()
    time.sleep(0.02)
    s.data_tick()
    time.sleep(0.01)
    s.step_tick()
    out = s.flush()
    assert out["data_load_s"] >= 0.015
    assert out["step_s"] >= 0.005
    assert s.n == 0  # reset


def test_device_memory_stats_shape():
    out = device_memory_stats()
    assert isinstance(out, dict)  # CPU backend: usually empty


def test_profiler_trace(tmp_path):
    import jax.numpy as jnp

    with profiler_trace(str(tmp_path)):
        _ = jnp.ones((8, 8)) @ jnp.ones((8, 8))
    # trace directory created with some artifacts
    assert os.path.isdir(tmp_path)

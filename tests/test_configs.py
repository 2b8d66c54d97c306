"""Example configs load and resolve through the registry."""

import glob
import os

import pytest

import funasr_tpu.models  # noqa: F401 - populate registry
from funasr_tpu.config import load_config
from funasr_tpu.registry import tables

CONFIGS = sorted(glob.glob(
    os.path.join(os.path.dirname(__file__), "..", "configs", "*.yaml")))


@pytest.mark.parametrize("path", CONFIGS, ids=[os.path.basename(p)
                                               for p in CONFIGS])
def test_config_resolves(path):
    cfg = load_config(path)
    assert "model" in cfg
    cls = tables.get("model_classes", cfg["model"])  # must be registered
    assert cls is not None
    enc = cfg.get("encoder")
    if enc:
        assert tables.get("encoder_classes", enc) is not None


def test_configs_exist():
    assert len(CONFIGS) >= 5

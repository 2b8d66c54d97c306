"""Registry / config / mask / posenc unit tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from funasr_tpu.registry import RegisterTables
from funasr_tpu.config import deep_update, load_config
from funasr_tpu.ops.masks import sequence_mask, mask_fill
from funasr_tpu.ops.posenc import sinusoidal_encoding, transformer_encoding


def test_registry_roundtrip():
    tables = RegisterTables()

    @tables.register("encoder_classes", "Dummy")
    class Dummy:
        def __init__(self, a=1):
            self.a = a

    assert tables.get("encoder_classes", "Dummy") is Dummy
    obj = tables.build("encoder_classes", "Dummy", a=5)
    assert obj.a == 5
    with pytest.raises(KeyError):
        tables.get("encoder_classes", "Nope")


def test_deep_update():
    base = {"a": 1, "b": {"x": 1, "y": 2}}
    out = deep_update(base, {"b": {"y": 3, "z": 4}, "c": 5})
    assert out == {"a": 1, "b": {"x": 1, "y": 3, "z": 4}, "c": 5}


def test_load_config_yaml(tmp_path):
    p = tmp_path / "config.yaml"
    p.write_text("model: Paraformer\nmodel_conf:\n  ctc_weight: 0.0\n")
    cfg = load_config(str(p), **{"model_conf": {"ctc_weight": 0.3}})
    assert cfg["model"] == "Paraformer"
    assert cfg["model_conf"]["ctc_weight"] == 0.3


def test_sequence_mask():
    m = sequence_mask(jnp.array([2, 4]), 5)
    np.testing.assert_array_equal(
        np.asarray(m), [[1, 1, 0, 0, 0], [1, 1, 1, 1, 0]]
    )


def test_mask_fill_no_nan():
    scores = jnp.zeros((1, 3))
    mask = jnp.array([[0, 0, 0]])
    filled = mask_fill(scores, mask)
    sm = jnp.exp(filled - filled.max())  # softmax on fully-masked row is finite
    assert np.isfinite(np.asarray(sm)).all()


def test_sinusoidal_encoding_funasr_semantics():
    enc = np.asarray(sinusoidal_encoding(4, 8))
    # position starts at 1; first column is sin(p * 1.0)
    np.testing.assert_allclose(enc[:, 0], np.sin([1, 2, 3, 4]), atol=1e-6)
    # concat layout: second half is cos
    np.testing.assert_allclose(enc[:, 4], np.cos([1, 2, 3, 4]), atol=1e-6)


def test_transformer_encoding_interleave():
    enc = np.asarray(transformer_encoding(3, 4))
    np.testing.assert_allclose(enc[0], [0, 1, 0, 1], atol=1e-6)


def test_jax_platforms_env_honored_in_subprocess():
    """Importing funasr_tpu re-applies JAX_PLATFORMS even when a preloaded
    PJRT plugin (sitecustomize) clobbered the env selection."""
    import os
    import subprocess
    import sys

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "-c",
         "import funasr_tpu, jax; print(jax.devices()[0].platform)"],
        env=env, capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.strip().splitlines()[-1] == "cpu"

"""Pipeline parallelism (GPipe schedule over a mesh axis) — exactness.

The pipeline must produce byte-for-byte the result of a sequential
``lax.scan`` over the same stacked layer params."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from funasr_tpu.parallel.mesh import make_mesh
from funasr_tpu.parallel.pipeline import pipeline_apply


def _layer(p, x):
    # a residual MLP layer: x + tanh(x @ w + b) @ v
    h = jnp.tanh(x @ p["w"] + p["b"])
    return x + h @ p["v"]


def _stack_params(rng, L, D, H):
    return {
        "w": jnp.asarray(rng.standard_normal((L, D, H)) * 0.1, jnp.float32),
        "b": jnp.asarray(rng.standard_normal((L, H)) * 0.1, jnp.float32),
        "v": jnp.asarray(rng.standard_normal((L, H, D)) * 0.1, jnp.float32),
    }


def _sequential(params, x):
    def body(h, p):
        return _layer(p, h), None

    y, _ = jax.lax.scan(body, x, params)
    return y


@pytest.mark.parametrize("stages,n_micro", [(8, 4), (4, 2), (2, 8)])
def test_pipeline_matches_sequential(rng, stages, n_micro):
    mesh = make_mesh(data=8 // stages, model=stages)
    L, D, H, B = stages * 2, 16, 32, 8
    params = _stack_params(rng, L, D, H)
    x = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)

    want = _sequential(params, x)
    with mesh:
        got = jax.jit(
            lambda p, x: pipeline_apply(_layer, p, x, n_micro, mesh))(
                params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_pipeline_validates_divisibility(rng):
    mesh = make_mesh(data=1, model=8)
    params = _stack_params(rng, 12, 8, 8)  # 12 layers over 8 stages
    x = jnp.zeros((4, 8), jnp.float32)
    with pytest.raises(ValueError, match="not divisible"):
        with mesh:
            pipeline_apply(_layer, params, x, 2, mesh)

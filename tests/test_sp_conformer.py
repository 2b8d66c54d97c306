"""Sequence-parallel Conformer encoder vs the single-device module.

Ring rel-pos attention (blockwise Transformer-XL shift), halo'd conv
module (real flax module reuse), unmodified variables — exact to fp32
tolerance on the 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from funasr_tpu.models.conformer import ConformerEncoder
from funasr_tpu.parallel.mesh import make_mesh
from funasr_tpu.parallel.sp_conformer import sp_conformer_encoder

CFG = dict(output_size=16, attention_heads=2, linear_units=32,
           num_blocks=3, cnn_module_kernel=7)


def _build(rng, input_layer, T, B=2):
    from funasr_tpu.ops import quant

    quant.enable(False)
    enc = ConformerEncoder(input_size=20, dropout_rate=0.0,
                           attention_dropout_rate=0.0,
                           input_layer=input_layer, **CFG)
    xs = jnp.asarray(rng.standard_normal((B, T, 20)), jnp.float32)
    lengths = jnp.array([T, T - 13][:B], jnp.int32)
    variables = enc.init({"params": jax.random.PRNGKey(0)}, xs, lengths)
    return enc, variables, xs, lengths


@pytest.mark.parametrize("input_layer,T", [
    ("linear", 64),    # 8 frames/shard
    ("conv2d", 259),   # subsamples to 64
])
def test_sp_conformer_matches_module(rng, input_layer, T):
    enc, variables, xs, lengths = _build(rng, input_layer, T)
    want, want_len = enc.apply(variables, xs, lengths, True)

    mesh = make_mesh(data=1, model=8)
    with mesh:
        got, got_len = jax.jit(lambda v, x, l: sp_conformer_encoder(
            v, x, l, mesh, input_layer=input_layer, **CFG))(
            variables, xs, lengths)
    np.testing.assert_array_equal(np.asarray(got_len),
                                  np.asarray(want_len))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-4, rtol=3e-4)


def test_sp_conformer_bf16(rng):
    enc, variables, xs, lengths = _build(rng, "linear", 64)
    from funasr_tpu.models.conformer import ConformerEncoder as CE
    from funasr_tpu.ops import quant

    quant.enable(False)
    enc16 = CE(input_size=20, dropout_rate=0.0,
               attention_dropout_rate=0.0, input_layer="linear",
               dtype=jnp.bfloat16, **CFG)
    want, _ = enc16.apply(variables, xs, lengths, True)
    mesh = make_mesh(data=1, model=8)
    with mesh:
        got, _ = jax.jit(lambda v, x, l: sp_conformer_encoder(
            v, x, l, mesh, input_layer="linear", dtype=jnp.bfloat16,
            **CFG))(variables, xs, lengths)
    assert got.dtype == jnp.bfloat16
    scale = float(jnp.max(jnp.abs(want.astype(jnp.float32))))
    np.testing.assert_allclose(
        np.asarray(got, jnp.float32), np.asarray(want, jnp.float32),
        atol=0.08 * scale)


def test_sp_conformer_validates_divisibility(rng):
    enc, variables, xs, lengths = _build(rng, "linear", 60)
    mesh = make_mesh(data=1, model=8)
    with pytest.raises(ValueError, match="divisible"):
        with mesh:
            sp_conformer_encoder(variables, xs, lengths, mesh,
                                 input_layer="linear", **CFG)

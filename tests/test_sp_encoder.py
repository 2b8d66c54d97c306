"""Sequence-parallel SANM encoder vs the single-device module — exact.

Same parameter tree, same math: the sharded encoder (ring attention +
FSMN halo exchange) must reproduce SANMEncoder.apply to fp32 tolerance,
including padded frames and the 560->512-style first layer."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from funasr_tpu.models.sanm import SANMEncoder
from funasr_tpu.parallel.mesh import make_mesh
from funasr_tpu.parallel.sp_encoder import sp_sanm_encoder

CFG = dict(output_size=16, attention_heads=2, linear_units=32,
           num_blocks=3, kernel_size=5, sanm_shfit=0)


def _build(rng, input_size, T, B=2):
    from funasr_tpu.ops import quant

    quant.enable(False)
    enc = SANMEncoder(input_size=input_size, dropout_rate=0.0,
                      attention_dropout_rate=0.0,
                      output_size=CFG["output_size"],
                      attention_heads=CFG["attention_heads"],
                      linear_units=CFG["linear_units"],
                      num_blocks=CFG["num_blocks"],
                      kernel_size=CFG["kernel_size"])
    xs = jnp.asarray(rng.standard_normal((B, T, input_size)), jnp.float32)
    lengths = jnp.array([T, T - 11][:B], jnp.int32)
    variables = enc.init({"params": jax.random.PRNGKey(0)}, xs, lengths)
    return enc, variables, xs, lengths


@pytest.mark.parametrize("input_size", [16, 24])  # 24: first-layer resize
def test_sp_encoder_matches_module(rng, input_size):
    T = 64  # 8 frames/shard on the 8-device mesh (>= kernel halo of 2)
    enc, variables, xs, lengths = _build(rng, input_size, T)
    want, _ = enc.apply(variables, xs, lengths, True)

    mesh = make_mesh(data=1, model=8)
    with mesh:
        got, got_len = jax.jit(lambda v, x, l: sp_sanm_encoder(
            v, x, l, mesh, input_layer="pe",
            output_size=CFG["output_size"],
            attention_heads=CFG["attention_heads"],
            linear_units=CFG["linear_units"],
            num_blocks=CFG["num_blocks"],
            kernel_size=CFG["kernel_size"]))(variables, xs, lengths)
    assert (np.asarray(got_len) == np.asarray(lengths)).all()
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_sp_encoder_bf16_matches_bf16_module(rng):
    """bf16 SP (bf16 matmuls, fp32 norms/softmax) vs the single-device
    module built with dtype=bf16 — same mixed-precision recipe, so
    outputs agree to bf16 tolerance."""
    T = 64
    from funasr_tpu.ops import quant

    quant.enable(False)
    enc = SANMEncoder(input_size=16, dropout_rate=0.0,
                      attention_dropout_rate=0.0,
                      output_size=CFG["output_size"],
                      attention_heads=CFG["attention_heads"],
                      linear_units=CFG["linear_units"],
                      num_blocks=CFG["num_blocks"],
                      kernel_size=CFG["kernel_size"],
                      dtype=jnp.bfloat16)
    xs = jnp.asarray(rng.standard_normal((2, T, 16)), jnp.float32)
    lengths = jnp.array([T, T - 11], jnp.int32)
    variables = enc.init({"params": jax.random.PRNGKey(0)}, xs, lengths)
    want, _ = enc.apply(variables, xs, lengths, True)

    mesh = make_mesh(data=1, model=8)
    with mesh:
        got, _ = jax.jit(lambda v, x, l: sp_sanm_encoder(
            v, x, l, mesh, input_layer="pe", dtype=jnp.bfloat16,
            output_size=CFG["output_size"],
            attention_heads=CFG["attention_heads"],
            linear_units=CFG["linear_units"],
            num_blocks=CFG["num_blocks"],
            kernel_size=CFG["kernel_size"]))(variables, xs, lengths)
    assert got.dtype == jnp.bfloat16
    scale = float(jnp.max(jnp.abs(want.astype(jnp.float32))))
    np.testing.assert_allclose(
        np.asarray(got, jnp.float32), np.asarray(want, jnp.float32),
        atol=0.06 * scale)


def test_sp_encoder_validates_halo(rng):
    enc, variables, xs, lengths = _build(rng, 16, 8)  # 1 frame/shard
    mesh = make_mesh(data=1, model=8)
    with pytest.raises(ValueError, match="halo"):
        with mesh:
            sp_sanm_encoder(variables, xs, lengths, mesh,
                            output_size=CFG["output_size"],
                            attention_heads=CFG["attention_heads"],
                            linear_units=CFG["linear_units"],
                            num_blocks=CFG["num_blocks"],
                            kernel_size=CFG["kernel_size"])

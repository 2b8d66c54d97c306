"""Pallas quantization kernels, interpret mode (funasr_tpu/ops/{quant,ffn}_pallas).

Real-TPU compiles of both kernels are exercised by bench.py; these pin the
math against the XLA formulations on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np

from funasr_tpu.ops import quant
from funasr_tpu.ops.ffn_pallas import fused_ffn
from funasr_tpu.ops.ffn_pallas import supported as ffn_supported
from funasr_tpu.ops.quant_pallas import _pick_tiles, quant_matmul
from funasr_tpu.ops.quant_pallas import supported as qmm_supported


def test_quant_matmul_matches_xla_recipe():
    rng = np.random.default_rng(0)
    for (M, K, N) in [(256, 512, 2048), (128, 2048, 512), (384, 512, 8404)]:
        x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((K, N)), jnp.float32)
        ref = quant.int8_dot_general(x, w, (((1,), (0,)), ((), ())),
                                     min_m=0, min_n=0)
        out = quant_matmul(x, w, interpret=True)
        err = (np.abs(np.asarray(out - ref)).max()
               / np.abs(np.asarray(ref)).max())
        assert err < 1e-5, (M, K, N, err)


def test_quant_matmul_leading_dims_and_gates():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 64, 512)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((512, 256)), jnp.float32)
    out = quant_matmul(x, w, interpret=True)
    assert out.shape == (2, 64, 256)
    assert qmm_supported(16384, 512, 2048)
    assert not qmm_supported(16384, 560, 2048)   # K not lane-aligned
    assert not qmm_supported(100, 512, 2048)     # M not tileable
    tm, tn = _pick_tiles(24576, 512, 2048)
    assert 24576 % tm == 0 and 2048 % tn == 0


def test_fused_ffn_float_exact():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 128, 512)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((512, 1024)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(1024) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((1024, 512)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(512) * 0.1, jnp.float32)
    ref = jnp.maximum(x @ w1 + b1, 0.0) @ w2 + b2
    out = fused_ffn(x, w1, b1, w2, b2, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_ffn_int8_matches_quant_recipe():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((256, 512)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((512, 1024)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(1024) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((1024, 512)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(512) * 0.1, jnp.float32)
    d = (((1,), (0,)), ((), ()))
    h = jnp.maximum(
        quant.int8_dot_general(x, w1, d, min_m=0, min_n=0) + b1, 0.0)
    ref = quant.int8_dot_general(h, w2, d, min_m=0, min_n=0) + b2
    out = fused_ffn(x, w1, b1, w2, b2, int8=True, interpret=True)
    err = np.abs(np.asarray(out - ref)).max() / np.abs(np.asarray(ref)).max()
    assert err < 1e-5
    # and both stay within int8 error of the float FFN
    flt = jnp.maximum(x @ w1 + b1, 0.0) @ w2 + b2
    err8 = np.abs(np.asarray(out - flt)).max() / np.abs(np.asarray(flt)).max()
    assert err8 < 0.05


def test_ffn_supported_gates():
    assert ffn_supported(24576, 512, 2048, 512, jnp.bfloat16)
    assert not ffn_supported(24576, 560, 2048, 512, jnp.bfloat16)
    assert not ffn_supported(100, 512, 2048, 512, jnp.bfloat16)
    assert not ffn_supported(24576, 512, 2048, 512, jnp.int8)


def test_encoder_params_identical_with_and_without_fused_path(monkeypatch):
    """The fused-FFN branch must create the exact same parameter tree as
    the nn.Dense path (names, shapes, init distributions' shapes)."""
    from funasr_tpu.models.sanm import PositionwiseFeedForward
    import funasr_tpu.ops.ffn_pallas as FP

    x = jnp.zeros((1, 128, 256), jnp.float32)
    mod = PositionwiseFeedForward(1024, 256)
    p_xla = mod.init(jax.random.PRNGKey(0), x)

    monkeypatch.setattr(FP, "enabled", lambda: True)
    monkeypatch.setattr(FP, "fused_ffn",
                        lambda x, w1, b1, w2, b2, **kw:
                        jnp.maximum(x @ w1 + b1, 0) @ w2 + b2)
    with quant.quantized():
        p_fused = mod.init(jax.random.PRNGKey(0), x)
    t1 = jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)), p_xla)
    t2 = jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)), p_fused)
    assert t1 == t2

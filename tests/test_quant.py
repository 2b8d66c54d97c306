"""int8 dynamic quantization (funasr_tpu/ops/quant.py).

Reference analogue: onnxruntime dynamic quantization of every MatMul
(runtime/docs/benchmark_onnx_cpp.md:63-81 — int8 keeps CER at 1.95 while
halving RTF).  These tests pin the TPU recipe: per-row activation scales x
per-channel weight scales, int32 accumulation, and greedy-decode stability
on the flagship model family.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from funasr_tpu.ops import quant


def test_int8_dot_matches_float_within_quant_error():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 37, 64)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((64, 48)), jnp.float32)
    dims = (((2,), (0,)), ((), ()))
    ref = lax.dot_general(x, w, dims)
    out = quant.int8_dot_general(x, w, dims, min_m=0, min_n=0)
    assert out.shape == ref.shape and out.dtype == ref.dtype
    # int8 error scales with the output magnitude (row scale x col scale):
    # normalize by the output's dynamic range, like quantization SNR
    err = np.abs(np.asarray(out - ref)).max() / np.abs(np.asarray(ref)).max()
    assert err < 0.03
    # int8 rounding is deterministic
    out2 = quant.int8_dot_general(x, w, dims, min_m=0, min_n=0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_zero_rows_and_scalars_are_safe():
    x = jnp.zeros((2, 8, 16), jnp.float32)  # padding rows: absmax 0
    w = jnp.ones((16, 4), jnp.float32)
    out = quant.int8_dot_general(x, w, (((2,), (0,)), ((), ())), min_m=0, min_n=0)
    assert np.all(np.isfinite(np.asarray(out)))
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_non_dense_shapes_fall_back_to_float():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.standard_normal((3, 5, 7)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((3, 7, 4)), jnp.float32)
    dims = (((2,), (1,)), ((0,), (0,)))  # batched matmul: not Dense-shaped
    ref = lax.dot_general(a, b, dims)
    out = quant.int8_dot_general(a, b, dims, min_m=0, min_n=0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_maybe_switch_and_context_manager():
    x = jnp.asarray(np.random.default_rng(2).standard_normal((4, 16)),
                    jnp.float32)
    w = jnp.asarray(np.random.default_rng(3).standard_normal((16, 8)),
                    jnp.float32)
    dims = (((1,), (0,)), ((), ()))
    assert not quant.enabled()
    off = quant.maybe_int8_dot_general(x, w, dims)
    np.testing.assert_array_equal(np.asarray(off),
                                  np.asarray(lax.dot_general(x, w, dims)))
    with quant.quantized():
        assert quant.enabled()
        on = quant.maybe_int8_dot_general(x, w, dims)
        np.testing.assert_array_equal(
            np.asarray(on), np.asarray(quant.int8_dot_general(x, w, dims)))
        forced = quant.int8_dot_general(x, w, dims, min_m=0, min_n=0)
        assert not np.array_equal(np.asarray(forced), np.asarray(off))
    assert not quant.enabled()


def test_bf16_inputs_quantize_cleanly():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((8, 32)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((32, 16)), jnp.bfloat16)
    dims = (((1,), (0,)), ((), ()))
    out = quant.int8_dot_general(x, w, dims, min_m=0, min_n=0)
    assert out.dtype == jnp.bfloat16
    ref = lax.dot_general(x.astype(jnp.float32), w.astype(jnp.float32), dims)
    err = (np.abs(np.asarray(out, np.float32) - np.asarray(ref)).max()
           / np.abs(np.asarray(ref)).max())
    assert err < 0.04  # int8 + bf16 rounding


def test_paraformer_greedy_decode_stable_under_int8():
    """Token-level agreement between fp32 and int8 greedy decode on the
    flagship architecture (the reference's int8 deploy keeps CER unchanged,
    benchmark_onnx_cpp.md:63-65)."""
    from tests.test_auto_model import ASR_CFG
    from funasr_tpu.registry import tables

    cfg = dict(ASR_CFG)
    module = tables.get("model_classes", cfg["model"])(
        vocab_size=cfg["vocab_size"], input_size=cfg["input_size"],
        encoder_conf=cfg["encoder_conf"], decoder_conf=cfg["decoder_conf"],
        predictor_conf=cfg["predictor_conf"],
    )
    rng = np.random.default_rng(5)
    T = 64
    x = jnp.asarray(rng.standard_normal((2, T, cfg["input_size"])) * 0.5,
                    jnp.float32)
    lens = jnp.asarray([T, T - 10], jnp.int32)
    params = module.init({"params": jax.random.PRNGKey(0)}, x, lens,
                         max_tokens=16, method=module.greedy_decode)
    tok_f, len_f, _ = module.apply(params, x, lens, max_tokens=16,
                                   method=module.greedy_decode)
    with quant.quantized():
        tok_q, len_q, _ = module.apply(params, x, lens, max_tokens=16,
                                       method=module.greedy_decode)
    tok_f, tok_q = np.asarray(tok_f), np.asarray(tok_q)
    len_f, len_q = np.asarray(len_f), np.asarray(len_q)
    # CIF token counts must survive quantization; tokens may flip rarely
    np.testing.assert_array_equal(len_f, len_q)
    n = int(len_f.sum())
    agree = sum(
        int(np.sum(tok_f[i, : len_f[i]] == tok_q[i, : len_f[i]]))
        for i in range(2)
    )
    assert agree >= 0.9 * n, f"only {agree}/{n} tokens agree under int8"


def test_auto_model_quantize_flag_is_scoped():
    """quantize=True must apply during that model's generate() only — not
    flip the process-global flag at init (which would leak int8 into a
    later non-quantized AutoModel's engine traces)."""
    from funasr_tpu.auto.auto_model import AutoModel

    prev = quant.enabled()
    try:
        am = AutoModel(quantize=True)  # no model: just the flag plumbing
        assert not quant.enabled()     # init does NOT flip the global

        seen = {}

        class FakeEngine:
            def transcribe(self, chunk, **kw):
                seen["quant_on"] = quant.enabled()
                return [{"text": ""} for _ in chunk]

        am.engine = FakeEngine()
        am.generate(np.zeros(1600, np.float32))
        assert seen["quant_on"] is True
        assert not quant.enabled()     # restored after generate

        am2 = AutoModel()              # default follows the global
        am2.engine = FakeEngine()
        am2.generate(np.zeros(1600, np.float32))
        assert seen["quant_on"] is False
    finally:
        quant.enable(prev)

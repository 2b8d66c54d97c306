"""Fused SANM layer kernel (ops/sanm_layer_pallas.py) vs the module's XLA
path: interpret mode on CPU, int8 numerics on both sides."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from funasr_tpu.models.sanm import EncoderLayerSANM
from funasr_tpu.ops import quant
from funasr_tpu.ops.masks import key_mask
from funasr_tpu.ops.sanm_layer_pallas import fused_sanm_layer, supported


def _layer_and_params(B=3, T=64, D=256, H=1024, NH=2, K=11, dtype=jnp.bfloat16):
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, T, D), jnp.float32).astype(dtype)
    lengths = jnp.array([T, T - 10, 17], jnp.int32)
    layer = EncoderLayerSANM(in_size=D, size=D, n_head=NH, linear_units=H,
                             kernel_size=K, dropout_rate=0.0,
                             dtype=dtype, param_dtype=jnp.float32)
    mask = key_mask(lengths, T, dtype=jnp.float32)
    params = layer.init(rng, x, mask, True)
    return layer, params, x, lengths, mask


def _run_fused(params, x, lengths, NH=2, K=11, interpret=True):
    p = params["params"]
    return fused_sanm_layer(
        x, lengths,
        (p["norm1"]["scale"], p["norm1"]["bias"]),
        p["self_attn"]["linear_q_k_v"]["kernel"],
        p["self_attn"]["linear_q_k_v"]["bias"],
        p["self_attn"]["fsmn_block"],
        p["self_attn"]["linear_out"]["kernel"],
        p["self_attn"]["linear_out"]["bias"],
        (p["norm2"]["scale"], p["norm2"]["bias"]),
        p["feed_forward"]["w_1"]["kernel"], p["feed_forward"]["w_1"]["bias"],
        p["feed_forward"]["w_2"]["kernel"], p["feed_forward"]["w_2"]["bias"],
        n_head=NH, left=(K - 1) // 2, right=K - 1 - (K - 1) // 2,
        interpret=interpret)


def test_supported_gate():
    assert supported(256, 512, 2048, 4)
    assert not supported(250, 512, 2048, 4)   # T not sublane-aligned
    assert not supported(256, 512, 2048, 8)   # d_head 64 not lane-aligned
    assert not supported(2048, 512, 2048, 4)  # VMEM blowout


def test_fused_layer_matches_xla_int8():
    layer, params, x, lengths, mask = _layer_and_params()
    import funasr_tpu.ops.quant as Q
    orig = Q.int8_dot_general
    Q.int8_dot_general = lambda *a, **k: orig(
        *a, **{**k, "min_m": 0, "min_n": 0})
    try:
        with quant.quantized(True):
            # CPU: SL.enabled() is False, so apply() takes the XLA path
            ref, _ = layer.apply(params, x, mask, True)
    finally:
        Q.int8_dot_general = orig
    out = _run_fused(params, x, lengths)
    ref = np.asarray(ref, np.float32)
    out = np.asarray(out, np.float32)
    vm = np.asarray(key_mask(lengths, x.shape[1]))[:, 0, :, None]
    rel = (np.abs(ref - out) * vm).max() / (np.abs(ref * vm).max() + 1e-9)
    assert rel < 0.06, rel


def test_fused_layer_padding_invariance():
    """Valid-row outputs must not depend on garbage in padded rows."""
    layer, params, x, lengths, _ = _layer_and_params()
    out1 = np.asarray(_run_fused(params, x, lengths), np.float32)
    noise = jax.random.normal(jax.random.PRNGKey(9), x.shape, jnp.float32)
    T = x.shape[1]
    pad = (jnp.arange(T)[None, :, None] >= lengths[:, None, None])
    x2 = jnp.where(pad, (x.astype(jnp.float32) + 10 * noise), x.astype(jnp.float32)).astype(x.dtype)
    out2 = np.asarray(_run_fused(params, x2, lengths), np.float32)
    vm = np.asarray(key_mask(lengths, T))[:, 0, :, None]
    np.testing.assert_allclose(out1 * vm, out2 * vm, rtol=0, atol=2e-2)


def test_module_param_tree_identical_under_fusion(monkeypatch):
    """init under the fused branch must produce the same tree as the XLA
    branch (checkpoint compatibility)."""
    from funasr_tpu.ops import sanm_layer_pallas as SL
    layer, params, x, lengths, mask = _layer_and_params()

    monkeypatch.setattr(SL, "enabled", lambda: True)
    calls = {}

    def fake_fused(xx, ll, ln1, wqkv, bqkv, fsmn, wout, bout, ln2,
                   w1, b1, w2, b2, **kw):
        calls["hit"] = True
        return xx  # passthrough; only the param tree matters here

    monkeypatch.setattr(SL, "fused_sanm_layer", fake_fused)
    with quant.quantized(True):
        params_fused = layer.init(jax.random.PRNGKey(0), x, mask, True)
    assert calls.get("hit")
    ref_tree = jax.tree_util.tree_structure(params)
    fused_tree = jax.tree_util.tree_structure(params_fused)
    assert ref_tree == fused_tree
    for (kp, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(params),
            jax.tree_util.tree_leaves_with_path(params_fused)):
        assert a.shape == b.shape, kp
        assert a.dtype == b.dtype, kp


def test_encoder_fused_stack_matches_module(monkeypatch):
    """SANMEncoder's pre-quantized fused-stack path (interpret mode): same
    param tree (incl. values) as the module path, and matching outputs."""
    from jax.experimental.pallas import tpu as pltpu
    from funasr_tpu.models.sanm import SANMEncoder
    from funasr_tpu.ops import sanm_layer_pallas as SL

    B, T, D, H, NH = 2, 64, 256, 1024, 2
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, T, 560), jnp.float32)
    lengths = jnp.array([T, T - 13], jnp.int32)
    enc = SANMEncoder(input_size=560, output_size=D, attention_heads=NH,
                      linear_units=H, num_blocks=4, dropout_rate=0.0,
                      dtype=jnp.bfloat16, param_dtype=jnp.float32)
    p_off = enc.init(rng, x, lengths, True)
    ref, _ = enc.apply(p_off, x, lengths, True)

    monkeypatch.setattr(SL, "enabled", lambda: True)
    with quant.quantized(True):
        with pltpu.force_tpu_interpret_mode():
            p_on = enc.init(rng, x, lengths, True)
            out, _ = enc.apply(p_on, x, lengths, True)

    assert (jax.tree_util.tree_structure(p_off)
            == jax.tree_util.tree_structure(p_on))
    for (kp, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(p_off),
                               jax.tree_util.tree_leaves_with_path(p_on)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(kp))
    ref = np.asarray(ref, np.float32)
    out = np.asarray(out, np.float32)
    vm = (np.arange(T)[None, :, None] < np.asarray(lengths)[:, None, None])
    rel = (np.abs(ref - out) * vm).max() / (np.abs(ref * vm).max() + 1e-9)
    assert rel < 0.08, rel


def test_fused_layer_int8_attn_numerics():
    """int8 attention scores (optional, off by default: VPU quant overhead
    outweighs the MXU saving at flagship shapes) must stay within int8
    tolerance of the bf16-attention kernel."""
    from funasr_tpu.ops import sanm_layer_pallas as SL

    layer, params, x, lengths, _ = _layer_and_params()
    p = params["params"]
    args = ((p["norm1"]["scale"], p["norm1"]["bias"]),
            p["self_attn"]["linear_q_k_v"]["kernel"],
            p["self_attn"]["linear_q_k_v"]["bias"],
            p["self_attn"]["fsmn_block"],
            p["self_attn"]["linear_out"]["kernel"],
            p["self_attn"]["linear_out"]["bias"],
            (p["norm2"]["scale"], p["norm2"]["bias"]),
            p["feed_forward"]["w_1"]["kernel"], p["feed_forward"]["w_1"]["bias"],
            p["feed_forward"]["w_2"]["kernel"], p["feed_forward"]["w_2"]["bias"])
    kw = dict(n_head=2, left=5, right=5, interpret=True)
    a = np.asarray(SL.fused_sanm_layer(x, lengths, *args, int8_attn=False,
                                       **kw), np.float32)
    b = np.asarray(SL.fused_sanm_layer(x, lengths, *args, int8_attn=True,
                                       **kw), np.float32)
    vm = np.asarray(key_mask(lengths, x.shape[1]))[:, 0, :, None]
    rel = (np.abs(a - b) * vm).max() / (np.abs(a * vm).max() + 1e-9)
    assert rel < 0.05, rel

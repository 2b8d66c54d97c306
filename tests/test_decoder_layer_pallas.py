"""Fused Paraformer decoder layer kernel vs the module's XLA path
(interpret mode on CPU; param-tree checkpoint compatibility)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from funasr_tpu.models.paraformer.decoder import (
    DecoderLayerSANM,
    ParaformerSANMDecoder,
)
from funasr_tpu.ops import quant
from funasr_tpu.ops.masks import key_mask, sequence_mask


def _setup(B=2, U=24, T=40, D=256, H=1024, NH=2):
    rng = jax.random.PRNGKey(0)
    tgt = jax.random.normal(rng, (B, U, D), jnp.float32).astype(jnp.bfloat16)
    memory = jax.random.normal(jax.random.PRNGKey(1), (B, T, D),
                               jnp.float32).astype(jnp.bfloat16)
    tgt_lens = jnp.array([U, U - 7], jnp.int32)
    mem_lens = jnp.array([T, T - 11], jnp.int32)
    tgt_mask = sequence_mask(tgt_lens, U, dtype=jnp.float32)[:, :, None]
    memory_mask = key_mask(mem_lens, T, dtype=jnp.float32)
    layer = DecoderLayerSANM(size=D, n_head=NH, linear_units=H,
                             kernel_size=11, dropout_rate=0.0,
                             dtype=jnp.bfloat16, param_dtype=jnp.float32)
    inputs = (tgt_mask, memory, memory_mask)
    params = layer.init(rng, tgt, inputs, True)
    return layer, params, tgt, inputs, tgt_lens, mem_lens


def test_fused_decoder_layer_matches_xla(monkeypatch):
    from funasr_tpu.ops import decoder_layer_pallas as DL

    layer, params, tgt, inputs, tgt_lens, mem_lens = _setup()
    import funasr_tpu.ops.quant as Q
    orig = Q.int8_dot_general
    Q.int8_dot_general = lambda *a, **k: orig(
        *a, **{**k, "min_m": 0, "min_n": 0})
    try:
        with quant.quantized(True):
            ref, _ = layer.apply(params, tgt, inputs, True)  # CPU: XLA path
    finally:
        Q.int8_dot_general = orig

    monkeypatch.setattr(DL, "enabled", lambda: True)
    with quant.quantized(True):
        with pltpu.force_tpu_interpret_mode():
            params2 = layer.init(jax.random.PRNGKey(0), tgt, inputs, True)
            out, _ = layer.apply(params2, tgt, inputs, True)

    # checkpoint compatibility: identical trees and values
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params2))
    for (kp, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(params),
                               jax.tree_util.tree_leaves_with_path(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(kp))

    ref = np.asarray(ref, np.float32)
    out = np.asarray(out, np.float32)
    vm = (np.arange(tgt.shape[1])[None, :, None]
          < np.asarray(tgt_lens)[:, None, None])
    rel = (np.abs(ref - out) * vm).max() / (np.abs(ref * vm).max() + 1e-9)
    assert rel < 0.06, rel


def test_full_decoder_fused_stack(monkeypatch):
    """Whole ParaformerSANMDecoder under the fused layer path."""
    from funasr_tpu.ops import decoder_layer_pallas as DL

    B, U, T, D = 2, 24, 40, 256
    dec = ParaformerSANMDecoder(
        vocab_size=128, encoder_output_size=D, attention_heads=2,
        linear_units=1024, num_blocks=3, att_layer_num=3,
        dropout_rate=0.0, dtype=jnp.bfloat16, param_dtype=jnp.float32)
    memory = jax.random.normal(jax.random.PRNGKey(1), (B, T, D), jnp.float32)
    sem = jax.random.normal(jax.random.PRNGKey(2), (B, U, D), jnp.float32)
    mem_lens = jnp.array([T, T - 11], jnp.int32)
    tok_lens = jnp.array([U - 2, U - 9], jnp.int32)
    params = dec.init(jax.random.PRNGKey(0), memory, mem_lens, sem,
                      tok_lens, True)
    ref = dec.apply(params, memory, mem_lens, sem, tok_lens, True)

    monkeypatch.setattr(DL, "enabled", lambda: True)
    with quant.quantized(True):
        with pltpu.force_tpu_interpret_mode():
            out = dec.apply(params, memory, mem_lens, sem, tok_lens, True)

    ref = np.asarray(ref, np.float32)
    out = np.asarray(out, np.float32)
    vm = (np.arange(U)[None, :, None] < np.asarray(tok_lens)[:, None, None])
    # int8 vs bf16 over 3 layers + vocab projection: loose tolerance, but
    # the argmax tokens must agree nearly everywhere
    agree = ((ref.argmax(-1) == out.argmax(-1)) | ~vm[:, :, 0]).mean()
    assert agree > 0.95, agree
    rel = (np.abs(ref - out) * vm).max() / (np.abs(ref * vm).max() + 1e-9)
    assert rel < 0.2, rel

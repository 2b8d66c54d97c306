"""Sequence-parallel Paraformer decoder vs the single-device module.

Same parameter tree, exact math: cross-attention over the sharded memory
(pmax + psum softmax combine) must match ParaformerSANMDecoder.apply, and
the chained sp_encoder -> sp_decoder path must match encoder -> decoder
without ever gathering the memory."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from funasr_tpu.models.paraformer.decoder import ParaformerSANMDecoder
from funasr_tpu.parallel.mesh import make_mesh
from funasr_tpu.parallel.sp_decoder import sp_sanm_decoder

CFG = dict(attention_heads=2, linear_units=32, num_blocks=3,
           att_layer_num=2, kernel_size=5)


def _build(rng, T=64, U=6, B=2, D=16, vocab=24):
    from funasr_tpu.ops import quant

    quant.enable(False)
    dec = ParaformerSANMDecoder(
        vocab_size=vocab, encoder_output_size=D, dropout_rate=0.0,
        self_attention_dropout_rate=0.0, src_attention_dropout_rate=0.0,
        **CFG)
    memory = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    mem_lens = jnp.array([T, T - 13][:B], jnp.int32)
    sem = jnp.asarray(rng.standard_normal((B, U, D)), jnp.float32)
    tok_lens = jnp.array([U, U - 2][:B], jnp.int32)
    variables = dec.init({"params": jax.random.PRNGKey(0)},
                         memory, mem_lens, sem, tok_lens)
    return dec, variables, memory, mem_lens, sem, tok_lens


def test_sp_decoder_matches_module(rng):
    dec, variables, memory, mem_lens, sem, tok_lens = _build(rng)
    want = dec.apply(variables, memory, mem_lens, sem, tok_lens, True)

    mesh = make_mesh(data=1, model=8)
    with mesh:
        got = jax.jit(lambda v, m, ml, s, tl: sp_sanm_decoder(
            v, m, ml, s, tl, mesh, **CFG))(
                variables, memory, mem_lens, sem, tok_lens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_sp_encoder_decoder_chain(rng):
    """Full SP inference: the encoder memory stays sharded end to end."""
    from funasr_tpu.models.sanm import SANMEncoder
    from funasr_tpu.parallel.sp_encoder import sp_sanm_encoder

    ENC = dict(output_size=16, attention_heads=2, linear_units=32,
               num_blocks=2, kernel_size=5)
    enc = SANMEncoder(input_size=16, dropout_rate=0.0,
                      attention_dropout_rate=0.0, **ENC)
    T, B, U = 64, 2, 6
    xs = jnp.asarray(rng.standard_normal((B, T, 16)), jnp.float32)
    lens = jnp.array([T, T - 9], jnp.int32)
    enc_vars = enc.init({"params": jax.random.PRNGKey(0)}, xs, lens)

    dec, dec_vars, _, _, sem, tok_lens = _build(rng, T=T, U=U, B=B)

    # single-device reference chain
    mem_ref, _ = enc.apply(enc_vars, xs, lens, True)
    want = dec.apply(dec_vars, mem_ref, lens, sem, tok_lens, True)

    mesh = make_mesh(data=1, model=8)
    with mesh:
        def chain(ev, dv, xs, lens, sem, tok_lens):
            mem, _ = sp_sanm_encoder(ev, xs, lens, mesh, **ENC)
            return sp_sanm_decoder(dv, mem, lens, sem, tok_lens, mesh,
                                   **CFG)

        got = jax.jit(chain)(enc_vars, dec_vars, xs, lens, sem, tok_lens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-4, rtol=5e-4)

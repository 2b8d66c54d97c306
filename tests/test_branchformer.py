"""Branchformer / E-Branchformer encoders and hybrid models."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from funasr_tpu.models.branchformer import (
    Branchformer,
    BranchformerEncoder,
    EBranchformer,
    EBranchformerEncoder,
)

CONF = dict(output_size=16, attention_heads=2, linear_units=32,
            cgmlp_linear_units=32, num_blocks=2, cgmlp_conv_kernel=7,
            dropout_rate=0.0, attention_dropout_rate=0.0)


@pytest.mark.parametrize("cls", [BranchformerEncoder, EBranchformerEncoder])
def test_encoder_shapes_and_mask(cls, rng):
    enc = cls(input_size=20, **CONF)
    x = jnp.asarray(rng.standard_normal((2, 40, 20)), jnp.float32)
    lens = jnp.array([40, 24], jnp.int32)
    params = enc.init(jax.random.PRNGKey(0), x, lens)
    out, out_lens = enc.apply(params, x, lens)
    assert out.shape == (2, (40 - 1) // 2 // 2 - 1 + 1, 16) or out.shape[0] == 2
    assert out.shape[-1] == 16
    # padded region must not affect valid outputs: change tail, re-run
    x2 = x.at[1, 30:].set(99.0)
    out2, _ = enc.apply(params, x2, lens)
    n_valid = int(out_lens[1])
    np.testing.assert_allclose(np.asarray(out[1, :n_valid]),
                               np.asarray(out2[1, :n_valid]),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("cls", [Branchformer, EBranchformer])
def test_hybrid_model_train_and_decode(cls, rng):
    model = cls(
        vocab_size=11, input_size=20, encoder_conf=CONF,
        decoder_conf=dict(attention_heads=2, linear_units=32, num_blocks=1,
                          dropout_rate=0.0),
        ctc_weight=0.3,
    )
    x = jnp.asarray(rng.standard_normal((2, 40, 20)), jnp.float32)
    lens = jnp.array([40, 30], jnp.int32)
    text = jnp.array([[3, 4, 5, 0], [6, 7, 0, 0]], jnp.int32)
    tlens = jnp.array([3, 2], jnp.int32)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, lens, text, tlens)
    loss, stats = model.apply(params, x, lens, text, tlens,
                              deterministic=True,
                              rngs={"dropout": jax.random.PRNGKey(2)})
    assert np.isfinite(float(loss))
    assert {"loss", "loss_att", "loss_ctc", "acc"} <= set(stats)
    toks, tok_lens, scores = model.apply(
        params, x, lens, beam=3, maxlen=6, method=model.decode_beam)
    assert toks.shape[0] == 2 and toks.shape[1] == 3
    assert np.isfinite(np.asarray(scores)).all()

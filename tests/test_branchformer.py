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
    x = jnp.asarray(rng.standard_normal((2, 120, 20)), jnp.float32)
    lens = jnp.array([120, 80], jnp.int32)
    params = enc.init(jax.random.PRNGKey(0), x, lens)
    out, out_lens = enc.apply(params, x, lens)
    assert out.shape[0] == 2
    assert out.shape[-1] == 16
    # attention is masked, but the CSGU/merge convs run UNMASKED like the
    # reference (cgmlp.py:110, e_branchformer/encoder.py:160): pad frames
    # bleed into the conv tail of the last valid frames, and from the
    # second layer on that contamination spreads globally through
    # attention (exactly as in the reference).  So prefix invariance is
    # only checkable with ONE layer.
    enc1 = cls(input_size=20, **dict(CONF, num_blocks=1))
    params1 = enc1.init(jax.random.PRNGKey(0), x, lens)
    out1, out_lens1 = enc1.apply(params1, x, lens)
    # perturb pads beyond the (unmasked, reference-parity) Conv2d
    # subsampling reach, so no VALID frame sees the change except through
    # the unmasked cgmlp/merge conv tail
    x2 = x.at[1, 90:].set(99.0)
    out2, _ = enc1.apply(params1, x2, lens)
    n_valid = int(out_lens1[1])
    margin = (7 // 2 + 3 // 2) + 2  # conv bleed + subsampling edge
    keep = n_valid - margin
    assert keep >= 5  # the test must actually check something
    np.testing.assert_allclose(np.asarray(out1[1, :keep]),
                               np.asarray(out2[1, :keep]),
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


def test_transformer_uses_vanilla_encoder(rng):
    """Transformer now runs the true TransformerEncoder (no conv module),
    SANM model the SANM encoder, CTC model is encoder+CTC only."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from funasr_tpu.models.transformer.model import CTCModel, SANM, Transformer

    x = jnp.asarray(rng.standard_normal((2, 24, 20)), jnp.float32)
    lens = jnp.array([24, 16], jnp.int32)
    text = jnp.array([[3, 4, 5], [6, 7, 0]], jnp.int32)
    tlens = jnp.array([3, 2], jnp.int32)

    tm = Transformer(vocab_size=12, input_size=20,
                     encoder_conf=dict(output_size=16, attention_heads=2,
                                       linear_units=32, num_blocks=2,
                                       dropout_rate=0.0))
    p = tm.init({"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(1)}, x, lens, text, tlens)
    # vanilla layer: per-layer linear_q/k/v self-attn, no conv module
    enc_layer = jax.tree_util.tree_map(
        lambda a: a, p["params"]["encoder"]["encoders"])
    assert "self_attn" in enc_layer and "conv_module" not in enc_layer
    loss, _ = tm.apply(p, x, lens, text, tlens, deterministic=True)
    assert np.isfinite(float(loss))

    sm = SANM(vocab_size=12, input_size=20,
              encoder_conf=dict(output_size=16, attention_heads=2,
                                linear_units=32, num_blocks=2, kernel_size=5,
                                dropout_rate=0.0))
    p = sm.init({"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(1)}, x, lens, text, tlens)
    assert "linear_q_k_v" in p["params"]["encoder"]["encoders0"]["self_attn"]
    loss, _ = sm.apply(p, x, lens, text, tlens, deterministic=True)
    assert np.isfinite(float(loss))

    cm = CTCModel(vocab_size=12, input_size=20,
                  encoder_conf=dict(output_size=16, attention_heads=2,
                                    linear_units=32, num_blocks=2,
                                    dropout_rate=0.0))
    p = cm.init({"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(1)}, x, lens, text, tlens)
    assert "decoder" not in p["params"]
    loss, stats = cm.apply(p, x, lens, text, tlens, deterministic=True)
    assert np.isfinite(float(loss))
    toks, tok_lens = cm.apply(p, x, lens, method=cm.greedy_decode)
    assert toks.shape[0] == 2

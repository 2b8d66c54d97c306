"""End-to-end Paraformer model tests (tiny config, CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from funasr_tpu.models.paraformer.model import Paraformer, add_eos

TINY = dict(
    vocab_size=32,
    input_size=24,
    encoder_conf=dict(output_size=16, attention_heads=2, linear_units=32,
                      num_blocks=3, dropout_rate=0.0, kernel_size=5),
    decoder_conf=dict(attention_heads=2, linear_units=32, num_blocks=2,
                      att_layer_num=2, kernel_size=5, dropout_rate=0.0),
    predictor_conf=dict(idim=16, threshold=1.0, l_order=1, r_order=1,
                        tail_threshold=0.45, dropout=0.0),
    predictor_weight=1.0,
    sampling_ratio=0.75,
)


@pytest.fixture(scope="module")
def model_and_params():
    model = Paraformer(**TINY)
    rng = jax.random.PRNGKey(0)
    B, T, U = 2, 40, 8
    speech = jax.random.normal(rng, (B, T, TINY["input_size"]))
    speech_lengths = jnp.array([T, T - 10])
    text = jax.random.randint(rng, (B, U), 3, TINY["vocab_size"])
    text_lengths = jnp.array([U, U - 3])
    text = jnp.where(jnp.arange(U)[None, :] < text_lengths[:, None], text, -1)
    params = model.init(
        {"params": rng, "dropout": rng, "sampler": rng},
        speech, speech_lengths, text, text_lengths,
    )
    return model, params, (speech, speech_lengths, text, text_lengths)


def test_add_eos():
    text = jnp.array([[5, 6, 7, -1], [8, -1, -1, -1]])
    lens = jnp.array([3, 1])
    out, out_lens = add_eos(text, lens, eos=2)
    np.testing.assert_array_equal(
        np.asarray(out), [[5, 6, 7, 2, -1], [8, 2, -1, -1, -1]]
    )
    np.testing.assert_array_equal(np.asarray(out_lens), [4, 2])


def test_train_forward_loss(model_and_params):
    model, params, batch = model_and_params
    loss, stats = model.apply(
        params, *batch, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(1), "sampler": jax.random.PRNGKey(2)},
    )
    assert np.isfinite(float(loss))
    assert np.isfinite(float(stats["loss_att"]))
    assert np.isfinite(float(stats["loss_pre"]))
    assert 0.0 <= float(stats["acc"]) <= 1.0


def test_train_grads_finite(model_and_params):
    model, params, batch = model_and_params

    def loss_fn(p):
        loss, _ = model.apply(
            p, *batch, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(1),
                  "sampler": jax.random.PRNGKey(2)},
        )
        return loss

    grads = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert leaves
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)


def test_greedy_decode_shapes(model_and_params):
    model, params, (speech, speech_lengths, *_s) = model_and_params
    tokens, tok_lens, scores = model.apply(
        params, speech, speech_lengths, max_tokens=16,
        method=model.greedy_decode,
    )
    assert tokens.shape == (2, 16)
    assert (np.asarray(tok_lens) <= 16).all()
    assert np.isfinite(np.asarray(scores)).all()


def test_inference_jits(model_and_params):
    model, params, (speech, speech_lengths, *_s) = model_and_params

    @jax.jit
    def run(p, s, sl):
        return model.apply(p, s, sl, max_tokens=16, method=model.greedy_decode)

    t1 = run(params, speech, speech_lengths)
    t2 = run(params, speech, speech_lengths)
    np.testing.assert_array_equal(np.asarray(t1[0]), np.asarray(t2[0]))


def test_batch_invariance(model_and_params):
    """A padded batch must give the same result as single-utterance runs."""
    model, params, (speech, speech_lengths, *_s) = model_and_params
    logp_b, lens_b, _ = model.apply(
        params, speech, speech_lengths, max_tokens=16,
        method=model.inference_logits,
    )
    for b in range(2):
        T1 = int(speech_lengths[b])
        logp_1, lens_1, _ = model.apply(
            params, speech[b:b + 1, :T1], speech_lengths[b:b + 1],
            max_tokens=16, method=model.inference_logits,
        )
        n = int(lens_1[0])
        assert int(lens_b[b]) == n
        np.testing.assert_allclose(
            np.asarray(logp_b[b, :n]), np.asarray(logp_1[0, :n]),
            rtol=1e-4, atol=1e-4,
        )


def test_paraformer_san_decoder(rng):
    """Paraformer with the standard-MHA decoder (reference
    ParaformerSANDecoder, decoder.py:982): bidirectional over CIF embeds."""
    from funasr_tpu.models.paraformer.model import Paraformer

    m = Paraformer(
        vocab_size=16, input_size=20,
        encoder_conf=dict(output_size=16, attention_heads=2,
                          linear_units=32, num_blocks=2, kernel_size=5,
                          dropout_rate=0.0),
        decoder_name="ParaformerSANDecoder",
        decoder_conf=dict(attention_heads=2, linear_units=32, num_blocks=2,
                          dropout_rate=0.0),
        predictor_conf=dict(idim=16, dropout=0.0), sampling_ratio=0.5)
    x = jnp.asarray(rng.standard_normal((2, 30, 20)), jnp.float32)
    lens = jnp.array([30, 22], jnp.int32)
    text = jnp.array([[3, 4, 5], [6, 7, -1]], jnp.int32)
    tlens = jnp.array([3, 2], jnp.int32)
    variables = m.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "sampler": jax.random.PRNGKey(2)},
        x, lens, text, tlens)
    loss, stats = m.apply(variables, x, lens, text, tlens,
                          deterministic=True,
                          rngs={"sampler": jax.random.PRNGKey(3)})
    assert np.isfinite(float(loss))
    # no FSMN block in the SAN decoder params
    dec = variables["params"]["decoder"]
    assert "fsmn_block" not in str(jax.tree_util.tree_structure(dec))
    toks, tok_lens, _ = m.apply(variables, x, lens, max_tokens=8,
                                method=m.greedy_decode)
    assert toks.shape == (2, 8)

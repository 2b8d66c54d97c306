"""SeACo-Paraformer hotword customization tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from funasr_tpu.models.seaco_paraformer.model import SeacoParaformer

CONF = dict(
    vocab_size=32,
    input_size=24,
    encoder_conf=dict(output_size=16, attention_heads=2, linear_units=32,
                      num_blocks=2, kernel_size=5, dropout_rate=0.0),
    decoder_conf=dict(attention_heads=2, linear_units=32, num_blocks=1,
                      att_layer_num=1, kernel_size=5, dropout_rate=0.0),
    predictor_conf=dict(idim=16, tail_threshold=0.45, dropout=0.0,
                        upsample_times=3),
    seaco_decoder_conf=dict(attention_heads=2, linear_units=32, num_blocks=1,
                            att_layer_num=1, kernel_size=5, dropout_rate=0.0),
    inner_dim=16,
    no_bias_id=31,
    sampling_ratio=0.0,
)


@pytest.fixture(scope="module")
def seaco():
    model = SeacoParaformer(**CONF)
    rng = np.random.default_rng(0)
    B, T = 2, 24
    speech = jnp.asarray(rng.standard_normal((B, T, 24)), jnp.float32)
    slens = jnp.array([T, T - 6])
    hotwords = jnp.asarray([[5, 6, 0], [7, 8, 9], [31, 0, 0]], jnp.int32)
    hlens = jnp.array([2, 3, 1])
    key = jax.random.PRNGKey(0)
    params = model.init(
        {"params": key},
        speech, slens, hotwords, hlens, max_tokens=10,
        method=model.decode_with_hotwords,
    )
    return model, params, (speech, slens, hotwords, hlens)


def test_decode_with_hotwords(seaco):
    model, params, (speech, slens, hotwords, hlens) = seaco
    tokens, tok_lens, us_alphas, us_peaks = model.apply(
        params, speech, slens, hotwords, hlens, max_tokens=10,
        method=model.decode_with_hotwords,
    )
    assert tokens.shape == (2, 10)
    assert (np.asarray(tok_lens) <= 10).all()
    assert us_peaks.shape == us_alphas.shape  # BiCif stamps in the same pass


def test_hotword_count_invariance(seaco):
    """Token count must not change with the number of hotwords supplied."""
    model, params, (speech, slens, hotwords, hlens) = seaco
    _, lens_a, _, _ = model.apply(params, speech, slens, hotwords, hlens,
                            max_tokens=10, method=model.decode_with_hotwords)
    hot_b = jnp.asarray([[31, 0, 0]], jnp.int32)  # only the no-bias entry
    _, lens_b, _, _ = model.apply(params, speech, slens, hot_b, jnp.array([1]),
                            max_tokens=10, method=model.decode_with_hotwords)
    np.testing.assert_array_equal(np.asarray(lens_a), np.asarray(lens_b))


def test_seaco_loss(seaco, rng):
    model, params, (speech, slens, hotwords, hlens) = seaco
    B, U = 2, 5
    text = jnp.asarray(rng.integers(3, 30, (B, U)), jnp.int32)
    tlens = jnp.full((B,), U, jnp.int32)
    # seaco labels: (B, U+1-1) grid of NO_BIAS / hotword tokens
    labels = jnp.full((B, U), CONF["no_bias_id"], jnp.int32)
    # the loss path creates no new params vs. decode path + training extras;
    # init through the loss to cover them all
    key = jax.random.PRNGKey(1)
    params2 = model.init(
        {"params": key, "dropout": key, "sampler": key},
        speech, slens, text, tlens, hotwords, hlens, labels,
        method=model.seaco_loss,
    )
    loss = model.apply(params2, speech, slens, text, tlens, hotwords, hlens,
                       labels, deterministic=True, method=model.seaco_loss)
    assert np.isfinite(float(loss))

"""BiCifParaformer: V3 predictor upsampled head + losses + timestamps."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from funasr_tpu.models.bicif_paraformer.model import BiCifParaformer, CifPredictorV3

CONF = dict(
    vocab_size=32,
    input_size=24,
    encoder_conf=dict(output_size=16, attention_heads=2, linear_units=32,
                      num_blocks=2, kernel_size=5, dropout_rate=0.0),
    decoder_conf=dict(attention_heads=2, linear_units=32, num_blocks=1,
                      att_layer_num=1, kernel_size=5, dropout_rate=0.0),
    predictor_conf=dict(idim=16, tail_threshold=0.45, dropout=0.0,
                        upsample_times=3),
    sampling_ratio=0.0,
)


def test_predictor_v3_shapes(rng):
    pred = CifPredictorV3(idim=16, upsample_times=3, dropout=0.0)
    hidden = jnp.asarray(rng.standard_normal((2, 20, 16)), jnp.float32)
    lens = jnp.array([20, 15])
    params = pred.init(jax.random.PRNGKey(0), hidden, lens, 12)
    out = pred.apply(params, hidden, lens, 12)
    assert out.base.acoustic_embeds.shape == (2, 12, 16)
    # upsampled track covers T*u frames (tail handling stays pre-upsample)
    assert out.us_alphas.shape == (2, 60)
    assert out.us_peaks.shape == out.us_alphas.shape


def test_bicif_train_and_timestamps(rng):
    model = BiCifParaformer(**CONF)
    B, T, U = 2, 30, 6
    speech = jnp.asarray(rng.standard_normal((B, T, 24)), jnp.float32)
    slens = jnp.array([T, T - 8])
    text = jnp.asarray(rng.integers(3, 32, (B, U)), jnp.int32)
    tlens = jnp.array([U, U - 2])
    text = jnp.where(jnp.arange(U)[None] < tlens[:, None], text, -1)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "sampler": jax.random.PRNGKey(2)},
        speech, slens, text, tlens,
    )
    loss, stats = model.apply(params, speech, slens, text, tlens,
                              deterministic=True)
    assert np.isfinite(float(loss))
    assert "loss_pre2" in stats

    tokens, tok_lens, us_alphas, us_peaks = model.apply(
        params, speech, slens, max_tokens=16, method=model.timestamps)
    assert tokens.shape == (B, 16)
    assert us_peaks.shape[1] == T * 3  # upsample x3 of the encoder frames
    assert us_alphas.shape == us_peaks.shape


def test_bicif_greedy_decode_inherited(rng):
    """Regression: Paraformer.greedy_decode must work on BiCif's V3
    predictor output (engine with_timestamp=False path)."""
    model = BiCifParaformer(**CONF)
    B, T = 2, 20
    speech = jnp.asarray(rng.standard_normal((B, T, CONF["input_size"])),
                         jnp.float32)
    lens = jnp.array([T, T - 4], jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, speech, lens,
                        max_tokens=8, method=model.timestamps)
    toks, tlens, scores = model.apply(params, speech, lens, max_tokens=8,
                                      method=model.greedy_decode)
    assert toks.shape == (B, 8)
    assert np.isfinite(np.asarray(scores)).all()

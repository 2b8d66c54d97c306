"""E-Paraformer / PIF predictor."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from funasr_tpu.models.e_paraformer.model import EParaformer
from funasr_tpu.models.e_paraformer.predictor import PifPredictor

CFG = dict(
    vocab_size=11, input_size=20,
    encoder_conf=dict(output_size=16, attention_heads=2, linear_units=32,
                      num_blocks=2, kernel_size=5, dropout_rate=0.0),
    decoder_conf=dict(attention_heads=2, linear_units=32, num_blocks=1,
                      att_layer_num=1, kernel_size=5, dropout_rate=0.0),
    predictor_conf=dict(idim=16, dropout=0.0, sigma_heads=2),
    sampling_ratio=0.0,
)


def test_pif_predictor_soft_attention(rng):
    pred = PifPredictor(idim=8, dropout=0.0, sigma_heads=2)
    h = jnp.asarray(rng.standard_normal((2, 12, 8)), jnp.float32)
    lens = jnp.array([12, 8], jnp.int32)
    params = pred.init(jax.random.PRNGKey(0), h, lens, max_tokens=6)
    out = pred.apply(params, h, lens, max_tokens=6)
    assert out.acoustic_embeds.shape == (2, 6, 8)
    assert out.token_num.shape == (2,)
    assert np.isfinite(np.asarray(out.acoustic_embeds)).all()
    # with a target length the grid is populated exactly to that length
    out_t = pred.apply(params, h, lens, max_tokens=6,
                       target_length=jnp.array([3.0, 2.0]))
    emb = np.asarray(out_t.acoustic_embeds)
    assert np.abs(emb[0, 3:]).max() == 0.0
    assert np.abs(emb[1, 2:]).max() == 0.0
    assert np.abs(emb[0, :3]).max() > 0.0


def test_eparaformer_train_and_decode(rng):
    model = EParaformer(**CFG)
    x = jnp.asarray(rng.standard_normal((2, 24, 20)), jnp.float32)
    lens = jnp.array([24, 16], jnp.int32)
    text = jnp.array([[3, 4, 5], [6, 7, 0]], jnp.int32)
    tlens = jnp.array([3, 2], jnp.int32)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, lens, text, tlens, deterministic=True)
    loss, stats = model.apply(params, x, lens, text, tlens,
                              deterministic=True)
    assert np.isfinite(float(loss))
    assert "loss_ctc" in stats  # ctc_weight 0.5 default
    toks, n, sc = jax.jit(lambda p, x, l: model.apply(
        p, x, l, max_tokens=8, method=model.greedy_decode))(params, x, lens)
    assert toks.shape == (2, 8)

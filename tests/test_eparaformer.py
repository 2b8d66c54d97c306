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


def test_eparaformer_r4_objective(rng):
    """The genuine e_paraformer training differences (reference
    model.py:76,235,315): predictor_bias=2 targets (<sos> y <eos>) and the
    with-grad first-decoder-pass loss pre_loss_att added to the total."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from funasr_tpu.models.e_paraformer.model import (EParaformer,
                                                      add_sos_and_eos)

    # add_sos_and_eos semantics
    text = jnp.array([[5, 6, -1], [7, -1, -1]])
    lens = jnp.array([2, 1])
    out, olens = add_sos_and_eos(text, lens, 1, 2)
    np.testing.assert_array_equal(np.asarray(out),
                                  [[1, 5, 6, 2, -1], [1, 7, 2, -1, -1]])
    np.testing.assert_array_equal(np.asarray(olens), [4, 3])

    m = EParaformer(
        vocab_size=16, input_size=20,
        encoder_conf=dict(output_size=16, attention_heads=2,
                          linear_units=32, num_blocks=2, kernel_size=5,
                          dropout_rate=0.0),
        decoder_conf=dict(attention_heads=2, linear_units=32, num_blocks=1,
                          att_layer_num=1, kernel_size=5, dropout_rate=0.0),
        predictor_conf=dict(idim=16, dropout=0.0, sigma_heads=2),
        sampling_ratio=0.75, ctc_weight=0.3,
    )
    x = jnp.asarray(rng.standard_normal((2, 24, 20)), jnp.float32)
    xl = jnp.array([24, 18])
    t = jnp.asarray(rng.integers(3, 15, (2, 4)), jnp.int32)
    tl = jnp.array([4, 3])
    t = jnp.where(jnp.arange(4)[None] < tl[:, None], t, -1)
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "sampler": jax.random.PRNGKey(2)}
    vs = m.init(rngs, x, xl, t, tl)
    loss, stats = m.apply(vs, x, xl, t, tl, deterministic=False,
                          rngs={"dropout": jax.random.PRNGKey(3),
                                "sampler": jax.random.PRNGKey(4)})
    assert np.isfinite(float(loss))
    assert "pre_loss_att" in stats and np.isfinite(float(stats["pre_loss_att"]))
    # the 1st-pass loss contributes gradients (with-grad sampler)
    g = jax.grad(lambda p: m.apply(
        p, x, xl, t, tl, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(3),
              "sampler": jax.random.PRNGKey(4)})[0])(vs)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)

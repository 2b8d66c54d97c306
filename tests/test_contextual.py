"""ContextualParaformer hotword v1: loss + biased decode."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from funasr_tpu.models.contextual_paraformer.model import ContextualParaformer

CFG = dict(
    vocab_size=12, input_size=20, inner_dim=16,
    encoder_conf=dict(output_size=16, attention_heads=2, linear_units=32,
                      num_blocks=2, kernel_size=5, dropout_rate=0.0),
    decoder_conf=dict(attention_heads=2, linear_units=32, num_blocks=1,
                      att_layer_num=1, kernel_size=5, dropout_rate=0.0),
    predictor_conf=dict(idim=16, tail_threshold=0.45, dropout=0.0),
    sampling_ratio=0.0,
)


@pytest.fixture(scope="module")
def ctx_model():
    model = ContextualParaformer(**CFG)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 24, 20)), jnp.float32)
    lens = jnp.array([24, 16], jnp.int32)
    hw = jnp.array([[3, 4], [7, 0], [0, 0]], jnp.int32)  # last row: no-bias
    hwl = jnp.array([2, 1, 1], jnp.int32)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, lens, hw, hwl, max_tokens=8,
        method=model.decode_with_hotwords)
    return model, params, (x, lens, hw, hwl)


def test_decode_with_hotwords(ctx_model):
    model, params, (x, lens, hw, hwl) = ctx_model
    toks, n = jax.jit(lambda p, *a: model.apply(
        p, *a, max_tokens=8, method=model.decode_with_hotwords)
    )(params, x, lens, hw, hwl)
    assert toks.shape == (2, 8)
    assert (np.asarray(n) <= 8).all()


def test_contextual_loss_and_grad(ctx_model):
    model, params, (x, lens, hw, hwl) = ctx_model
    text = jnp.array([[3, 4, 5], [7, 8, 0]], jnp.int32)
    tlens = jnp.array([3, 2], jnp.int32)

    def lf(p):
        return model.apply(p, x, lens, text, tlens, hw, hwl,
                           deterministic=True,
                           method=model.contextual_loss)

    loss, grads = jax.value_and_grad(lf)(params)
    assert np.isfinite(float(loss))
    # the bias branch (inside the decoder) must receive gradient
    bias_grads = grads["params"]["decoder"]["bias_output"]
    gsum = jax.tree_util.tree_reduce(
        lambda a, g: a + float(jnp.sum(jnp.abs(g))), bias_grads, 0.0)
    assert gsum > 0

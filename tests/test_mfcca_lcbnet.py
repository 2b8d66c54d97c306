"""MFCCA multichannel ASR + LCB-Net audio-visual biasing."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from funasr_tpu.models.lcbnet.model import LCBNet
from funasr_tpu.models.mfcca.model import MFCCA


def test_mfcca_multichannel_train_and_decode(rng):
    model = MFCCA(
        vocab_size=11, input_size=20,
        encoder_conf=dict(output_size=16, channel_dim=8, channel_layers=1,
                          channel_heads=2, attention_heads=2,
                          linear_units=32, num_blocks=1),
        decoder_conf=dict(attention_heads=2, linear_units=32, num_blocks=1,
                          dropout_rate=0.0),
    )
    x = jnp.asarray(rng.standard_normal((2, 3, 40, 20)), jnp.float32)  # 3ch
    lens = jnp.array([40, 30], jnp.int32)
    text = jnp.array([[3, 4, 5], [6, 7, 0]], jnp.int32)
    tlens = jnp.array([3, 2], jnp.int32)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, lens, text, tlens)
    loss, stats = model.apply(params, x, lens, text, tlens,
                              deterministic=True,
                              rngs={"dropout": jax.random.PRNGKey(2)})
    assert np.isfinite(float(loss))
    # channel permutation equivariance of fusion: mean-fuse makes the
    # encoder invariant to channel order
    loss2, _ = model.apply(params, x[:, ::-1], lens, text, tlens,
                           deterministic=True,
                           rngs={"dropout": jax.random.PRNGKey(2)})
    np.testing.assert_allclose(float(loss), float(loss2), rtol=1e-4)


def test_lcbnet_bias_text_changes_output(rng):
    model = LCBNet(
        vocab_size=11, input_size=20,
        encoder_conf=dict(output_size=16, attention_heads=2,
                          linear_units=32, num_blocks=1),
        text_encoder_conf=dict(attention_heads=2, linear_units=32,
                               num_blocks=1),
        decoder_conf=dict(attention_heads=2, linear_units=32, num_blocks=1,
                          dropout_rate=0.0),
    )
    x = jnp.asarray(rng.standard_normal((1, 40, 20)), jnp.float32)
    lens = jnp.array([40], jnp.int32)
    text = jnp.array([[3, 4, 5]], jnp.int32)
    tlens = jnp.array([3], jnp.int32)
    bias = jnp.array([[6, 7, 8, 0]], jnp.int32)
    blens = jnp.array([3], jnp.int32)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, lens, text, tlens, bias, blens)
    loss_b, stats = model.apply(params, x, lens, text, tlens, bias, blens,
                                deterministic=True)
    loss_nb, _ = model.apply(params, x, lens, text, tlens,
                             deterministic=True)
    assert np.isfinite(float(loss_b)) and np.isfinite(float(loss_nb))
    assert abs(float(loss_b) - float(loss_nb)) > 1e-6  # fusion is active
    toks, n = model.apply(params, x, lens, bias, blens,
                          method=model.ctc_greedy)
    assert toks.shape[0] == 1

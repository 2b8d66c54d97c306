"""UniASR 2-pass + SCAMA chunk-attention models."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from funasr_tpu.models.scama.model import SCAMA
from funasr_tpu.models.uniasr.model import UniASR, chunk_attn_mask

ENC = dict(output_size=16, attention_heads=2, linear_units=32, num_blocks=2,
           kernel_size=5, dropout_rate=0.0)
DEC = dict(attention_heads=2, linear_units=32, num_blocks=1, att_layer_num=1,
           kernel_size=5, dropout_rate=0.0)
PRED = dict(idim=16, tail_threshold=0.45, dropout=0.0)


def test_chunk_attn_mask():
    m = np.asarray(chunk_attn_mask(6, 2))
    assert m[0, 1] == 1          # within own chunk
    assert m[0, 2] == 0          # future chunk blocked
    assert m[4, 0] == 1          # all past with left_chunks=-1
    m2 = np.asarray(chunk_attn_mask(6, 2, left_chunks=1))
    assert m2[4, 0] == 0 and m2[4, 2] == 1  # only one past chunk


@pytest.fixture(scope="module")
def uniasr():
    model = UniASR(vocab_size=11, input_size=20, encoder_conf=ENC,
                   decoder_conf=DEC, predictor_conf=PRED, chunk_size=4)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 24, 20)), jnp.float32)
    lens = jnp.array([24, 16], jnp.int32)
    text = jnp.array([[3, 4, 5], [6, 7, 0]], jnp.int32)
    tlens = jnp.array([3, 2], jnp.int32)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, lens, text, tlens, deterministic=True)
    return model, params, (x, lens, text, tlens)


def test_uniasr_two_pass_loss(uniasr):
    model, params, (x, lens, text, tlens) = uniasr
    loss, stats = model.apply(params, x, lens, text, tlens,
                              deterministic=True)
    assert np.isfinite(float(loss))
    assert {"loss1", "loss2", "acc1", "acc2"} <= set(stats)
    w = model.loss_weight_model1
    np.testing.assert_allclose(
        float(loss), w * float(stats["loss1"]) + (1 - w) * float(stats["loss2"]),
        rtol=1e-6)


def test_uniasr_decode_both_passes(uniasr):
    model, params, (x, lens, _, _) = uniasr
    out = jax.jit(lambda p, x, l: model.apply(
        p, x, l, max_tokens=8, method=model.greedy_decode))(params, x, lens)
    assert set(out) == {"pass1", "pass2"}
    for toks, n in out.values():
        assert toks.shape == (2, 8)
        assert (np.asarray(n) <= 8).all()


def test_scama_train_and_decode(rng):
    model = SCAMA(vocab_size=11, input_size=20, encoder_conf=ENC,
                  decoder_conf=DEC, predictor_conf=PRED, chunk_size=4,
                  left_chunks=2, sampling_ratio=0.0)
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
    # r4: SCAMA decodes AR (chunk-aware FsmnDecoderSCAMAOpt); greedy is
    # the beam-1 path and returns (tokens, lengths)
    toks, n = model.apply(params, x, lens, max_tokens=8,
                          method=model.greedy_decode)
    assert toks.shape == (2, 8)
    # chunk locality: changing far-future frames must not change the first
    # chunk's encoding (left context only)
    enc1, _ = model.apply(params, x, lens, method=model.encode)
    x2 = x.at[:, 20:].set(0.0)
    enc2, _ = model.apply(params, x2, lens, method=model.encode)
    np.testing.assert_allclose(np.asarray(enc1[:, :4]),
                               np.asarray(enc2[:, :4]), rtol=2e-4, atol=2e-5)

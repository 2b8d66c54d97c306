"""RWKV encoder: WKV recurrence properties, BAT transducer integration."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from funasr_tpu.models.rwkv import RWKVBAT, RWKVEncoder, wkv_scan


def test_wkv_scan_matches_reference(rng):
    """Stabilized scan == naive O(T^2) weighted average."""
    B, T, C = 1, 8, 4
    k = jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32)
    w = jnp.asarray(np.abs(rng.standard_normal(C)) * 0.5, jnp.float32)
    u = jnp.asarray(rng.standard_normal(C) * 0.2, jnp.float32)
    out = np.asarray(wkv_scan(k, v, w, u))
    kn, vn = np.asarray(k)[0], np.asarray(v)[0]
    wn, un = np.asarray(w), np.asarray(u)
    for t in range(T):
        num = np.zeros(C)
        den = np.zeros(C)
        for i in range(t):
            wgt = np.exp(-(t - 1 - i) * wn + kn[i])
            num += wgt * vn[i]
            den += wgt
        wgt = np.exp(un + kn[t])
        num += wgt * vn[t]
        den += wgt
        np.testing.assert_allclose(out[0, t], num / den, rtol=1e-4,
                                   atol=1e-5)


def test_rwkv_encoder_causal(rng):
    enc = RWKVEncoder(input_size=12, output_size=16, num_blocks=2,
                      linear_units=32)
    x = jnp.asarray(rng.standard_normal((1, 20, 12)), jnp.float32)
    lens = jnp.array([20], jnp.int32)
    params = enc.init(jax.random.PRNGKey(0), x, lens)
    out1, _ = enc.apply(params, x, lens)
    # causality: changing the future must not change the past
    x2 = x.at[:, 10:].set(0.0)
    out2, _ = enc.apply(params, x2, lens)
    np.testing.assert_allclose(np.asarray(out1[:, :10]),
                               np.asarray(out2[:, :10]), rtol=1e-5,
                               atol=1e-6)
    assert out1.shape == (1, 20, 16)


def test_bat_train_and_decode(rng):
    model = RWKVBAT(
        vocab_size=9, input_size=12,
        encoder_conf=dict(output_size=16, num_blocks=2, linear_units=32),
        decoder_conf=dict(hidden_size=16, num_layers=1),
        joint_conf=dict(joint_size=16),
    )
    x = jnp.asarray(rng.standard_normal((2, 20, 12)), jnp.float32)
    lens = jnp.array([20, 14], jnp.int32)
    text = jnp.array([[3, 4, 5], [6, 7, 0]], jnp.int32)
    tlens = jnp.array([3, 2], jnp.int32)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, lens, text, tlens, deterministic=True)
    loss, _ = model.apply(params, x, lens, text, tlens, deterministic=True)
    assert np.isfinite(float(loss))
    toks, n = model.apply(params, x, lens, max_tokens=8,
                          method=model.greedy_decode)
    assert toks.shape[0] == 2


def test_conformer_rwkv_decoder(rng):
    """Conformer + TransformerRWKVDecoder (reference conformer_rwkv):
    loss/grad flow and causal prefix invariance of the decoder."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from funasr_tpu.models.transformer.model import Conformer

    m = Conformer(
        vocab_size=12, input_size=20,
        encoder_conf=dict(output_size=16, attention_heads=2,
                          linear_units=32, num_blocks=2,
                          cnn_module_kernel=7, dropout_rate=0.0),
        decoder="TransformerRWKVDecoder",
        decoder_conf=dict(attention_heads=2, linear_units=32, num_blocks=2,
                          dropout_rate=0.0),
        ctc_weight=0.3)
    x = jnp.asarray(rng.standard_normal((2, 24, 20)), jnp.float32)
    lens = jnp.array([24, 16], jnp.int32)
    text = jnp.array([[3, 4, 5], [6, 7, 0]], jnp.int32)
    tlens = jnp.array([3, 2], jnp.int32)
    params = m.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, lens, text, tlens)

    def lf(p):
        loss, _ = m.apply(p, x, lens, text, tlens, deterministic=True)
        return loss

    loss, grads = jax.value_and_grad(lf)(params)
    assert np.isfinite(float(loss))
    dec_g = jax.tree_util.tree_reduce(
        lambda a, g: a + float(jnp.sum(jnp.abs(g))),
        grads["params"]["decoder"], 0.0)
    assert dec_g > 0
    # RWKV self-mixing is causal: extending the target with extra tokens
    # must not change logits at earlier positions
    enc, enc_lens = m.apply(params, x, lens, method=m.encode)
    ys1 = jnp.array([[1, 3, 4]], jnp.int32)
    ys2 = jnp.array([[1, 3, 4, 9, 9]], jnp.int32)
    dec = lambda ys: m.apply(
        params, enc[:1], enc_lens[:1], ys,
        jnp.array([ys.shape[1]], jnp.int32), True,
        method=lambda mdl, *a: mdl.decoder_module(*a))
    l1 = dec(ys1)
    l2 = dec(ys2)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2[:, :3]),
                               rtol=2e-4, atol=2e-5)
    # beam decode runs end to end
    toks, lens_out, scores = m.apply(params, x, lens, 3, 5,
                                     method=m.decode_beam)
    assert toks.shape[0] == 2 and np.isfinite(np.asarray(scores)).all()

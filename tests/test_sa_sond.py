"""SA-ASR and SOND: profile-conditioned speaker outputs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from funasr_tpu.models.sa_asr.model import SAASR
from funasr_tpu.models.sond.model import SOND

SA_CFG = dict(
    vocab_size=11, input_size=20, spk_dim=8, spk_heads=2,
    encoder_conf=dict(output_size=16, attention_heads=2, linear_units=32,
                      num_blocks=2, kernel_size=5, dropout_rate=0.0),
    decoder_conf=dict(attention_heads=2, linear_units=32, num_blocks=1,
                      att_layer_num=1, kernel_size=5, dropout_rate=0.0),
    predictor_conf=dict(idim=16, tail_threshold=0.45, dropout=0.0),
    sampling_ratio=0.0,
)


def test_sa_asr_joint_loss_and_decode(rng):
    model = SAASR(**SA_CFG)
    x = jnp.asarray(rng.standard_normal((2, 24, 20)), jnp.float32)
    lens = jnp.array([24, 16], jnp.int32)
    text = jnp.array([[3, 4, 5], [6, 7, 0]], jnp.int32)
    tlens = jnp.array([3, 2], jnp.int32)
    profiles = jnp.asarray(rng.standard_normal((2, 3, 8)), jnp.float32)
    plens = jnp.array([3, 2], jnp.int32)
    spk_labels = jnp.array([[0, 0, 1, -1], [1, 1, -1, -1]], jnp.int32)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, lens, text, tlens, profiles, plens, spk_labels,
        deterministic=True, method=model.forward_sa)
    loss, stats = model.apply(params, x, lens, text, tlens, profiles, plens,
                              spk_labels, deterministic=True,
                              method=model.forward_sa)
    assert np.isfinite(float(loss))
    assert "loss_spk" in stats
    toks, n, spk = jax.jit(lambda p, *a: model.apply(
        p, *a, max_tokens=8, method=model.decode_sa))(
        params, x, lens, profiles, plens)
    assert toks.shape == (2, 8) and spk.shape == (2, 8)
    spk_np = np.asarray(spk)
    n_np = np.asarray(n)
    # valid positions carry a profile index within range; sample 1 only has
    # 2 valid profiles
    for b in range(2):
        got = spk_np[b, : n_np[b]]
        assert ((got >= 0) & (got < int(plens[b]))).all()


def test_sond_loss_and_diarize(rng):
    m = SOND(feat_dim=16, n_units=16, n_heads=2, n_layers=2, ffn=32,
             spk_dim=8)
    m.init_params(jax.random.PRNGKey(0), T=20, S=3)
    feats = rng.standard_normal((2, 20, 16)).astype(np.float32)
    lens = np.array([20, 14])
    profiles = rng.standard_normal((2, 3, 8)).astype(np.float32)
    plens = np.array([3, 2])
    targets = jnp.asarray(rng.integers(0, 2, (2, 20, 3)), jnp.float32)
    loss, grads = jax.value_and_grad(
        lambda p: m.loss(p, jnp.asarray(feats), jnp.asarray(lens),
                         jnp.asarray(profiles), jnp.asarray(plens), targets)
    )(m.params)
    assert np.isfinite(float(loss))
    segs = m.diarize(feats, lens, profiles, plens)
    assert len(segs) == 2
    # sample 1: only profiles 0/1 may appear
    for s in segs[1]:
        assert s[2] in (0.0, 1.0)

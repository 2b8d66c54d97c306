"""EEND diarization: PIT loss permutation invariance + segment extraction."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from funasr_tpu.models.eend.model import EENDOLA, pit_bce_loss


def test_pit_loss_permutation_invariant(rng):
    logits = jnp.asarray(rng.standard_normal((2, 20, 3)), jnp.float32)
    targets = jnp.asarray(rng.integers(0, 2, (2, 20, 3)), jnp.float32)
    lens = jnp.array([20, 15], jnp.int32)
    l1 = float(pit_bce_loss(logits, targets, lens))
    # permuting target speakers must not change the PIT loss
    l2 = float(pit_bce_loss(logits, targets[:, :, [2, 0, 1]], lens))
    assert l1 == pytest.approx(l2, rel=1e-6)
    # perfectly matched logits -> small loss
    strong = (targets * 2 - 1) * 10.0
    l3 = float(pit_bce_loss(strong, targets, lens))
    assert l3 < 1e-3


def test_pit_loss_masks_padding(rng):
    logits = jnp.asarray(rng.standard_normal((1, 10, 2)), jnp.float32)
    targets = jnp.asarray(rng.integers(0, 2, (1, 10, 2)), jnp.float32)
    lens = jnp.array([6], jnp.int32)
    l1 = float(pit_bce_loss(logits, targets, lens))
    # garbage in padded frames changes nothing
    logits2 = logits.at[0, 6:].set(99.0)
    l2 = float(pit_bce_loss(logits2, targets, lens))
    assert l1 == pytest.approx(l2, rel=1e-6)


def test_eend_train_and_diarize(rng):
    m = EENDOLA(feat_dim=16, n_units=16, n_heads=2, n_layers=2, ffn=32,
                max_speakers=2)
    m.init_params(jax.random.PRNGKey(0))
    feats = rng.standard_normal((2, 30, 16)).astype(np.float32)
    lens = np.array([30, 20])
    tgt = jnp.asarray(rng.integers(0, 2, (2, 30, 2)), jnp.float32)
    loss, grads = jax.value_and_grad(
        lambda p: m.loss(p, jnp.asarray(feats), jnp.asarray(lens), tgt)
    )(m.params)
    assert np.isfinite(float(loss))
    segs = m.diarize(feats, lens)
    assert len(segs) == 2
    for utt in segs:
        for s in utt:
            assert len(s) == 3 and s[1] > s[0] and s[2] in (0.0, 1.0)

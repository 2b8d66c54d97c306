"""MossFormer separation: SI-SNR math, PIT invariance, forward/loss."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from funasr_tpu.models.mossformer.model import (
    MossFormer,
    pit_si_snr_loss,
    si_snr,
)


def test_si_snr_identity_and_scale(rng):
    x = jnp.asarray(rng.standard_normal(1000), jnp.float32)
    assert float(si_snr(x, x)) > 50.0
    # scale invariance
    assert float(si_snr(3.0 * x, x)) > 50.0
    noisy = x + 0.1 * jnp.asarray(rng.standard_normal(1000), jnp.float32)
    v = float(si_snr(noisy, x))
    assert 10.0 < v < 30.0


def test_pit_si_snr_permutation_invariant(rng):
    refs = jnp.asarray(rng.standard_normal((2, 2, 500)), jnp.float32)
    est = refs + 0.05 * jnp.asarray(rng.standard_normal((2, 2, 500)),
                                    jnp.float32)
    l1 = float(pit_si_snr_loss(est, refs))
    l2 = float(pit_si_snr_loss(est[:, ::-1], refs))  # swapped speakers
    assert l1 == pytest.approx(l2, rel=1e-5)
    assert l1 < -15.0  # near-perfect estimates -> strongly negative loss


def test_mossformer_forward_and_loss(rng):
    m = MossFormer(num_spks=2, in_channels=16, out_channels=16,
                   num_blocks=2, kernel_size=16, group_size=32,
                   query_key_dim=24, expansion_factor=4.0)
    mix = jnp.asarray(rng.standard_normal((2, 800)), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), mix)
    est = m.apply(params, mix)
    assert est.shape == (2, 2, 800)
    refs = jnp.asarray(rng.standard_normal((2, 2, 800)), jnp.float32)
    loss, grads = jax.value_and_grad(
        lambda p: m.loss(p, mix, refs))(params)
    assert np.isfinite(float(loss))
    gsum = jax.tree_util.tree_reduce(
        lambda a, g: a + float(jnp.sum(jnp.abs(g))), grads, 0.0)
    assert gsum > 0

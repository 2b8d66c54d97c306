"""CIF correctness: interval-overlap matmul vs. the literal scan recurrence."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from funasr_tpu.ops.cif import (
    cif,
    cif_reference_scan,
    cif_tail,
    compensated_cumsum,
)


def _random_case(rng, B=3, T=64, D=8, scale=0.5):
    alphas = rng.uniform(0.0, scale, size=(B, T)).astype(np.float32)
    hidden = rng.standard_normal((B, T, D)).astype(np.float32)
    lengths = rng.integers(T // 2, T + 1, size=(B,))
    mask = np.arange(T)[None, :] < lengths[:, None]
    alphas *= mask
    hidden *= mask[:, :, None]
    return hidden, alphas, lengths


def test_cif_matches_scan_oracle(rng):
    hidden, alphas, _ = _random_case(rng)
    U = 40
    out = cif(jnp.asarray(hidden), jnp.asarray(alphas), U)
    ref_embeds, ref_count, _ = cif_reference_scan(
        jnp.asarray(hidden), jnp.asarray(alphas), U
    )
    ref_count = np.asarray(ref_count)
    embeds = np.asarray(out.embeds)
    # compare the fully-fired tokens (the scan oracle drops trailing partial mass)
    for b in range(hidden.shape[0]):
        n = ref_count[b]
        np.testing.assert_allclose(
            embeds[b, :n], np.asarray(ref_embeds)[b, :n], rtol=1e-5, atol=1e-5
        )
    # fired token count == floor of total alpha
    np.testing.assert_array_equal(ref_count, np.floor(alphas.sum(-1) + 1e-6))


def test_cif_token_num_and_fires(rng):
    hidden, alphas, _ = _random_case(rng, B=2, T=100, D=4, scale=0.9)
    out = cif(jnp.asarray(hidden), jnp.asarray(alphas), 64)
    np.testing.assert_allclose(np.asarray(out.token_num), alphas.sum(-1), rtol=1e-5)
    # fires fractional part tracks cumsum frac; integer bump marks a fire
    S = np.cumsum(alphas.astype(np.float64), axis=-1)
    P = S - alphas
    expect_peaks = np.floor(S) > np.floor(P)
    np.testing.assert_array_equal(np.asarray(out.peaks), expect_peaks)
    # number of peaks == floor(total mass)
    np.testing.assert_array_equal(
        np.asarray(out.peaks).sum(-1), np.floor(S[:, -1]).astype(int)
    )


def test_cif_training_rescale_exact_token_grid(rng):
    """Training contract: alphas rescaled to sum to target length -> every
    target slot gets ~unit mass of embedding (reference _calc_att_loss path)."""
    B, T, D, L = 2, 80, 16, 11
    hidden, alphas, _ = _random_case(rng, B=B, T=T, D=D, scale=0.5)
    alphas = alphas * (L / alphas.sum(-1, keepdims=True))
    out = cif(jnp.asarray(hidden), jnp.asarray(alphas), L)
    w_mass = np.asarray(out.embeds)
    # total weight mass per token is 1 (each token interval fully covered):
    ones = cif(jnp.ones_like(jnp.asarray(hidden)), jnp.asarray(alphas), L)
    np.testing.assert_allclose(
        np.asarray(ones.embeds)[:, :, 0], np.ones((B, L)), rtol=1e-4, atol=1e-4
    )
    assert w_mass.shape == (B, L, D)


def test_cif_tail_threshold(rng):
    """Tail frame (0.45 alpha at position len) fires a trailing partial token."""
    B, T, D = 2, 30, 4
    hidden, alphas, lengths = _random_case(rng, B=B, T=T, D=D, scale=0.4)
    # force a trailing partial accumulation of ~0.7
    total = alphas.sum(-1)
    target = np.floor(total) + 0.7
    alphas = alphas * (target / total)[:, None]
    h2, a2, tok = cif_tail(
        jnp.asarray(hidden), jnp.asarray(alphas), jnp.asarray(lengths), 0.45
    )
    assert h2.shape == (B, T + 1, D)
    np.testing.assert_allclose(
        np.asarray(tok), np.floor(alphas.sum(-1) + 0.45), atol=1e-5
    )
    out = cif(h2, a2, 40)
    # the fired token count increased by one vs. no tail
    base = cif(jnp.asarray(hidden), jnp.asarray(alphas), 40)
    assert (np.asarray(out.peaks).sum(-1) == np.asarray(base.peaks).sum(-1) + 1).all()


def test_compensated_cumsum_precision():
    """The TwoSum scan must resolve boundary crossings that plain f32 misses."""
    rng = np.random.default_rng(7)
    x = rng.uniform(0.05, 0.15, size=(1, 20000)).astype(np.float32)
    s, c = compensated_cumsum(jnp.asarray(x), axis=-1)
    true = np.cumsum(x.astype(np.float64), axis=-1)
    err_comp = np.abs((np.asarray(s, np.float64) + np.asarray(c, np.float64)) - true)
    err_plain = np.abs(np.asarray(jnp.cumsum(jnp.asarray(x), -1), np.float64) - true)
    assert err_comp.max() < 1e-3
    assert err_comp.max() <= err_plain.max()
    # relative error of the compensated sum stays at f32-ulp level
    assert (err_comp / true).max() < 1e-6


def test_cif_jit_and_grad(rng):
    hidden, alphas, _ = _random_case(rng, B=2, T=32, D=8)

    def loss(h, a):
        out = cif(h, a, 16)
        return jnp.sum(out.embeds**2) + jnp.sum(out.token_num)

    g = jax.grad(loss, argnums=(0, 1))(jnp.asarray(hidden), jnp.asarray(alphas))
    assert np.isfinite(np.asarray(g[0])).all()
    assert np.isfinite(np.asarray(g[1])).all()

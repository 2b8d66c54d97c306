"""Fused Pallas attention: interpret-mode parity vs the XLA path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from funasr_tpu.ops.attention_pallas import fused_attention, supported


def _xla_ref(q, k, v, bias):
    s = jnp.einsum("bthd,bshd->bhts", q, k).astype(jnp.float32)
    s = s + bias[:, None, None, :]
    p = jax.nn.softmax(s, -1).astype(v.dtype)
    return jnp.einsum("bhts,bshd->bthd", p, v)


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 1e-5),
                                       (jnp.bfloat16, 3e-2)])
def test_fused_attention_matches_xla(rng, dtype, tol):
    B, T, H, d = 2, 48, 2, 128
    q4 = jnp.asarray(rng.standard_normal((B, T, H, d)), dtype) * (d ** -0.5)
    k4 = jnp.asarray(rng.standard_normal((B, T, H, d)), dtype)
    v4 = jnp.asarray(rng.standard_normal((B, T, H, d)), dtype)
    lens = np.array([48, 30])
    bias = jnp.asarray(
        np.where(np.arange(T)[None] < lens[:, None], 0.0, -1e30), jnp.float32)
    out = fused_attention(q4.reshape(B, T, H * d), k4.reshape(B, T, H * d),
                          v4.reshape(B, T, H * d), bias, H, interpret=True)
    ref = _xla_ref(q4, k4, v4, bias).reshape(B, T, H * d)
    err = float(jnp.max(jnp.abs(
        out.astype(jnp.float32) - ref.astype(jnp.float32))))
    assert err < tol, err


def test_fused_attention_masked_keys_ignored(rng):
    """Changing padded key/value content must not change valid outputs."""
    B, T, D = 1, 32, 128
    q = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    n = 20
    bias = jnp.asarray(
        np.where(np.arange(T)[None] < n, 0.0, -1e30), jnp.float32)
    out1 = fused_attention(q, k, v, bias, 1, interpret=True)
    k2 = k.at[:, n:].set(99.0)
    v2 = v.at[:, n:].set(-99.0)
    out2 = fused_attention(q, k2, v2, bias, 1, interpret=True)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


def test_supported_gate():
    assert supported(256, 128, jnp.bfloat16, None)
    assert not supported(250, 128, jnp.bfloat16, None)  # sublane misalign
    assert not supported(256, 64, jnp.bfloat16, None)   # head dim < lane
    assert not supported(2048, 128, jnp.bfloat16, None)  # VMEM budget
    assert not supported(256, 128, jnp.bfloat16, object())  # structure mask
    assert not supported(256, 128, jnp.int8, None)


def test_sanm_encoder_unaffected_on_cpu(rng):
    """On CPU the encoder takes the XLA path (enabled() is False) — the
    golden-parity tests keep validating the exact reference numerics."""
    from funasr_tpu.ops.attention_pallas import enabled

    assert not enabled()

"""Ring attention (sequence-parallel) vs plain attention — exact match.

The online-softmax accumulation is algebraically exact, so over the
8-device CPU mesh the sharded result must equal single-device softmax
attention to fp32 tolerance, including length masking."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from funasr_tpu.parallel.mesh import make_mesh
from funasr_tpu.parallel.ring_attention import ring_attention_sharded


def _reference_attention(q, k, v, lengths):
    dh = q.shape[-1]
    s = jnp.einsum("bqhd,bkhd->bhqk", q * dh ** -0.5, k)
    mask = jnp.arange(k.shape[1])[None, :] < lengths[:, None]
    s = jnp.where(mask[:, None, None, :], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


@pytest.mark.parametrize("tl", [64, 40])
def test_ring_matches_plain_attention(rng, tl):
    mesh = make_mesh(data=1, model=8)
    B, T, H, Dh = 2, tl * 8 // 8 * 8, 2, 8
    T = tl  # total frames; must divide by 8
    if T % 8:
        pytest.skip("T must divide the mesh axis")
    q = jnp.asarray(rng.standard_normal((B, T, H, Dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, H, Dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, H, Dh)), jnp.float32)
    lengths = jnp.array([T, T - 13])

    with mesh:
        got = jax.jit(
            lambda q, k, v, ln: ring_attention_sharded(
                (q, k, v), ln, mesh))(q, k, v, lengths)
    want = _reference_attention(q, k, v, lengths)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_ring_attention_rows_past_length_are_finite(rng):
    """Query rows beyond a sequence's length see zero valid keys on some
    shards mid-ring; the accumulator must stay finite (no 0/0)."""
    mesh = make_mesh(data=1, model=8)
    B, T, H, Dh = 1, 32, 1, 4
    q = jnp.asarray(rng.standard_normal((B, T, H, Dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, H, Dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, H, Dh)), jnp.float32)
    lengths = jnp.array([8])  # only the first shard holds valid keys

    with mesh:
        got = np.asarray(jax.jit(
            lambda q, k, v, ln: ring_attention_sharded(
                (q, k, v), ln, mesh))(q, k, v, lengths))
    assert np.isfinite(got).all()
    want = np.asarray(_reference_attention(q, k, v, lengths))
    np.testing.assert_allclose(got[:, :8], want[:, :8], atol=1e-5,
                               rtol=1e-5)

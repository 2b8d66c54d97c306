"""conv1d_grouped: forward parity with XLA conv + SPMD-safe gradients.

Pins the jax 0.9.0 XLA SPMD bug workaround (ops/dwconv.py): grouped-conv
KERNEL grads come back scaled by the replicated mesh-axis size when the
input batch is sharded on a multi-axis mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from funasr_tpu.ops.dwconv import conv1d_grouped, depthwise_conv1d
from funasr_tpu.parallel.mesh import make_mesh


def _raw(x, kernel, left, right, groups):
    return lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (1,), [(left, right)],
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=groups)


CASES = [
    # (Cin, Cout, K, left, right, groups)
    (32, 32, 5, 2, 2, 32),     # depthwise FSMN 'same'
    (32, 32, 11, 10, 0, 32),   # causal FSMN (streaming)
    (16, 16, 4, 2, 1, 16),     # even kernel
    (16, 32, 3, 1, 1, 4),      # grouped, Cout != Cin
    (12, 12, 7, 3, 3, 1),      # dense (groups=1) sanity
]


@pytest.mark.parametrize("cin,cout,k,l,r,g", CASES)
def test_forward_matches_xla_conv(cin, cout, k, l, r, g):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((3, 17, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, cin // g, cout)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(conv1d_grouped(x, w, l, r, g)),
        np.asarray(_raw(x, w, l, r, g)), atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("cin,cout,k,l,r,g", CASES)
def test_grads_match_unsharded_reference(cin, cout, k, l, r, g):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((3, 17, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, cin // g, cout)), jnp.float32)
    ct = jnp.asarray(rng.standard_normal((3, 17 + l + r - k + 1, cout)),
                     jnp.float32)

    def loss_ref(x, w):
        return jnp.sum(_raw(x, w, l, r, g) * ct)

    def loss_new(x, w):
        return jnp.sum(conv1d_grouped(x, w, l, r, g) * ct)

    gx_ref, gw_ref = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    gx, gw = jax.grad(loss_new, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("dil,l,r", [(2, 4, 0), (3, 6, 6), (2, 1, 0)])
def test_dilated_grads_match(dil, l, r):
    """rhs_dilation path (VAD FSMN lstride/rstride)."""
    rng = np.random.default_rng(4)
    K, D = 4, 8
    x = jnp.asarray(rng.standard_normal((2, 21, D)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((K, 1, D)), jnp.float32)
    Tout = 21 + l + r - (K - 1) * dil
    ct = jnp.asarray(rng.standard_normal((2, Tout, D)), jnp.float32)

    def loss_ref(x, w):
        out = lax.conv_general_dilated(
            x, w, (1,), [(l, r)], rhs_dilation=(dil,),
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=D)
        return jnp.sum(out * ct)

    def loss_new(x, w):
        return jnp.sum(conv1d_grouped(x, w, l, r, D, dil) * ct)

    gx_ref, gw_ref = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    gx, gw = jax.grad(loss_new, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref),
                               atol=1e-4, rtol=1e-4)


def test_sharded_batch_grads_correct_on_two_axis_mesh():
    """THE bug scenario: batch sharded over `data` on a (4 data x 2 model)
    mesh.  The raw XLA path doubles the kernel grad; ours must not."""
    mesh = make_mesh(data=4, model=2)
    rng = np.random.default_rng(2)
    B, T, D, K = 8, 24, 32, 5
    x = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((K, 1, D)) * 0.1, jnp.float32)

    def loss(w, x):
        return jnp.sum(depthwise_conv1d(x, w, 2, 2) ** 2)

    gw_ref = jax.jit(jax.grad(loss))(w, x)  # replicated = ground truth
    x_sh = jax.device_put(x, NamedSharding(mesh, P("data", None, None)))
    with mesh:
        gw_sh = jax.jit(jax.grad(loss))(w, x_sh)
    np.testing.assert_allclose(np.asarray(gw_sh), np.asarray(gw_ref),
                               atol=1e-4, rtol=1e-4)


def test_upstream_bug_canary():
    """Documents the raw-XLA misbehaviour this module works around; if a
    jax upgrade fixes it, this SKIPS — signal that the custom VJP could
    be retired."""
    mesh = make_mesh(data=4, model=2)
    rng = np.random.default_rng(3)
    B, T, D, K = 8, 24, 16, 5
    x = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((K, 1, D)) * 0.1, jnp.float32)

    def loss(w, x):
        return jnp.sum(_raw(x, w, 2, 2, D) ** 2)

    gw_ref = jax.jit(jax.grad(loss))(w, x)
    x_sh = jax.device_put(x, NamedSharding(mesh, P("data", None, None)))
    with mesh:
        gw_sh = jax.jit(jax.grad(loss))(w, x_sh)
    ratio = np.median(np.asarray(gw_sh) / np.asarray(gw_ref))
    if abs(ratio - 1.0) < 1e-3:
        pytest.skip("upstream grouped-conv grad bug fixed; "
                    "ops/dwconv.py custom VJP no longer required")
    assert abs(ratio - 2.0) < 1e-3  # scaled by the model-axis size


@pytest.mark.parametrize("l,r", [(6, -2), (-1, 4), (10, 0)])
def test_negative_padding_grads(l, r):
    """Negative conv padding (edge trim — causal FSMN with large
    sanm_shift) must not crash the custom backward."""
    rng = np.random.default_rng(5)
    K, D, T = 5, 8, 20
    x = jnp.asarray(rng.standard_normal((2, T, D)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((K, 1, D)), jnp.float32)
    Tout = T + l + r - K + 1
    ct = jnp.asarray(rng.standard_normal((2, Tout, D)), jnp.float32)

    def loss_ref(x, w):
        return jnp.sum(_raw(x, w, l, r, D) * ct)

    def loss_new(x, w):
        return jnp.sum(conv1d_grouped(x, w, l, r, D) * ct)

    gx_ref, gw_ref = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    gx, gw = jax.grad(loss_new, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref),
                               atol=1e-4, rtol=1e-4)

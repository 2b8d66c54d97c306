"""Pallas CTC prefix recurrence == the lax.scan recurrence (interpret
mode on CPU; the real-TPU compile is exercised by the beam bench)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from funasr_tpu.ops.beam_search import _ctc_recurrence
from funasr_tpu.ops import ctc_prefix_pallas as CP


def test_ctc_recurrence_pallas_matches_scan(rng):
    B, K, W, T = 2, 3, 5, 45
    xg = jnp.asarray(rng.standard_normal((B, K, W, T)) * 2.0, jnp.float32)
    phi = jnp.asarray(rng.standard_normal((B, K, W, T)) * 2.0, jnp.float32)
    # sprinkle NEG_INF sentinels like real phi_shift step-0 columns
    phi = phi.at[:, :, :, 0].set(CP.NEG_INF)
    xb = jnp.asarray(rng.standard_normal((B, T)), jnp.float32)

    ref_nb, ref_b = _ctc_recurrence(xg, xb, phi)
    with pltpu.force_tpu_interpret_mode():
        got_nb, got_b = CP.ctc_recurrence(xg, xb, phi, block_t=16)
    np.testing.assert_allclose(np.asarray(got_nb), np.asarray(ref_nb),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(ref_b),
                               rtol=1e-6, atol=1e-6)


def test_ctc_recurrence_pallas_row_tiling(rng):
    """R > block_r exercises the sequential R-tile grid axis + carry
    re-init per row tile."""
    B, K, W, T = 4, 8, 9, 20  # R = 288 > block_r=128
    xg = jnp.asarray(rng.standard_normal((B, K, W, T)), jnp.float32)
    phi = jnp.asarray(rng.standard_normal((B, K, W, T)), jnp.float32)
    xb = jnp.asarray(rng.standard_normal((B, T)), jnp.float32)
    ref = _ctc_recurrence(xg, xb, phi)
    with pltpu.force_tpu_interpret_mode():
        got = CP.ctc_recurrence(xg, xb, phi, block_t=8, block_r=128)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-6, atol=1e-6)

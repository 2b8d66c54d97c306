"""Pallas fbank kernel == XLA fbank (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from funasr_tpu.ops import fbank as F


@pytest.mark.parametrize("precision,atol", [
    ("highest", 1e-3),   # full-f32 DFT: exact parity with the XLA path
    ("high", 0.02),      # bf16x3 DFT + bf16 mel: log-feature err < 0.02
])
def test_fbank_pallas_matches_xla(rng, precision, atol):
    from jax.experimental.pallas import tpu as pltpu

    from funasr_tpu.ops.fbank_pallas import fbank_pallas

    wav = rng.standard_normal((2, 16000)).astype(np.float32) * 0.1
    lens = jnp.array([16000, 9000])
    ref, ref_lens = F.fbank(jnp.asarray(wav), lens, dither=0.0)
    with pltpu.force_tpu_interpret_mode():
        got, got_lens = fbank_pallas(jnp.asarray(wav), lens, tile_t=32,
                                     precision=precision)
    np.testing.assert_array_equal(np.asarray(ref_lens), np.asarray(got_lens))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-4, atol=atol
    )


def test_fbank_pallas_with_energy_matches_compute_decibel(rng):
    """with_energy=True returns the VAD decibel track (compute_decibel
    semantics) alongside the mel features, from the same kernel pass."""
    from jax.experimental.pallas import tpu as pltpu

    from funasr_tpu.models.fsmn_vad.model import compute_decibel
    from funasr_tpu.ops.fbank_pallas import fbank_pallas

    wav = rng.standard_normal((2, 16000)).astype(np.float32) * 0.1
    lens = jnp.array([16000, 9000])
    ref, ref_lens = F.fbank(jnp.asarray(wav), lens, dither=0.0)
    with pltpu.force_tpu_interpret_mode():
        got, got_lens, db = fbank_pallas(jnp.asarray(wav), lens, tile_t=32,
                                         precision="highest",
                                         with_energy=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-3)
    for i, n in enumerate([16000, 9000]):
        want = compute_decibel(wav[i, :n])
        np.testing.assert_allclose(np.asarray(db)[i, : len(want)], want,
                                   atol=1e-3)

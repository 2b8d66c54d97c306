"""SpecAug / SpecAugLFR (reference funasr/models/specaug/specaug.py:17,106
and mask_along_axis.py) as pure JAX functions with explicit PRNG keys.

``SpecAugLFR`` masks LFR-stacked features: a frequency mask is drawn once in
the reduced band ``D = F // lfr_rate`` and replicated at offsets ``i*D`` so
the same mel band is masked in every stacked frame copy
(mask_along_axis.py:68 ``mask_along_axis_lfr`` — including its integer-
division band size).  Time warping is not applied (template.yaml:
apply_time_warp false) and is unimplemented.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def _mask_along_axis(
    rng: jax.Array,
    spec: jnp.ndarray,  # (B, T, F)
    dim: int,  # 1 = time, 2 = freq
    mask_width_range: Tuple[int, int],
    num_mask: int,
    lfr_rate: int = 1,
) -> jnp.ndarray:
    B = spec.shape[0]
    D_full = spec.shape[dim]
    D = D_full // lfr_rate if lfr_rate > 1 else D_full

    k1, k2 = jax.random.split(rng)
    mask_length = jax.random.randint(
        k1, (B, num_mask, 1), mask_width_range[0], mask_width_range[1]
    )
    # reference uses a python max(1, D - max_len); keep a static safe bound
    hi = max(1, D - mask_width_range[1])
    mask_pos = jax.random.randint(k2, (B, num_mask, 1), 0, hi)
    if lfr_rate > 1:
        mask_length = jnp.tile(mask_length, (1, lfr_rate, 1))
        mask_pos = jnp.concatenate(
            [mask_pos + D * i for i in range(lfr_rate)], axis=1
        )
    aran = lax.broadcasted_iota(jnp.int32, (1, 1, D_full), 2)
    mask = (mask_pos <= aran) & (aran < mask_pos + mask_length)
    mask = jnp.any(mask, axis=1)  # (B, D_full)
    if dim == 1:
        mask = mask[:, :, None]
    else:
        mask = mask[:, None, :]
    return jnp.where(mask, 0.0, spec)


def spec_aug_lfr(
    rng: jax.Array,
    spec: jnp.ndarray,  # (B, T, F) LFR features
    spec_lengths: jnp.ndarray,
    *,
    apply_freq_mask: bool = True,
    freq_mask_width_range: Sequence[int] = (0, 30),
    num_freq_mask: int = 1,
    lfr_rate: int = 6,
    apply_time_mask: bool = True,
    time_mask_width_range: Sequence[int] = (0, 12),
    num_time_mask: int = 1,
    **unused,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    kf, kt = jax.random.split(rng)
    if apply_freq_mask:
        spec = _mask_along_axis(
            kf, spec, 2, tuple(freq_mask_width_range), num_freq_mask, lfr_rate
        )
    if apply_time_mask:
        spec = _mask_along_axis(
            kt, spec, 1, tuple(time_mask_width_range), num_time_mask, 1
        )
    return spec, spec_lengths

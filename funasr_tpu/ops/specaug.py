"""SpecAug / SpecAugLFR (reference funasr/models/specaug/specaug.py:17,106
and mask_along_axis.py) as pure JAX functions with explicit PRNG keys.

``SpecAugLFR`` masks LFR-stacked features: a frequency mask is drawn once in
the reduced band ``D = F // lfr_rate`` and replicated at offsets ``i*D`` so
the same mel band is masked in every stacked frame copy
(mask_along_axis.py:68 ``mask_along_axis_lfr`` — including its integer-
division band size).  ``time_warp`` implements the sparse-image-warp
semantics (specaug.py TimeWarp) as a piecewise-linear time resample with
gather + lerp — static shapes, vmapped over the batch.
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


def time_warp(
    rng: jax.Array,
    spec: jnp.ndarray,  # (B, T, F)
    spec_lengths: jnp.ndarray,
    window: int = 5,
) -> jnp.ndarray:
    """SpecAugment time warp: pick a pivot frame c in [W, L-W) and shift it
    by d ~ U(-W+1, W-1); both sides stretch linearly (the 1-D equivalent of
    the reference's sparse_image_warp along time).  Frames beyond the valid
    length are untouched."""
    B, T, F = spec.shape

    def warp_one(x, L, key):
        kc, kd = jax.random.split(key)
        # reference time_warp.py:27 skips utterances with L <= 2*window
        do_warp = L > 2 * window
        Ls = jnp.maximum(L, 2 * window + 2)  # safe arithmetic when skipped
        # dynamic upper bound: sample u in [0,1) and scale to [W, L-W)
        u = jax.random.uniform(kc, ())
        c = (window + u * (Ls - 2 * window)).astype(jnp.int32)
        # warped = randint(c-w, c+w) + 1 -> d in [-w+1, w] inclusive
        d = jax.random.randint(kd, (), -window + 1, window + 1)
        p = c + d  # new pivot position
        t = jnp.arange(T, dtype=jnp.float32)
        Lf = Ls.astype(jnp.float32)
        cf, pf = c.astype(jnp.float32), p.astype(jnp.float32)
        src_left = t * cf / jnp.maximum(pf, 1.0)
        src_right = cf + (t - pf) * (Lf - cf) / jnp.maximum(Lf - pf, 1.0)
        src_w = jnp.clip(jnp.where(t < pf, src_left, src_right),
                         0.0, Lf - 1.0)
        src = jnp.where(do_warp & (t < Lf), src_w, t)  # pads/short untouched
        lo = jnp.floor(src).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, T - 1)
        frac = (src - lo.astype(jnp.float32))[:, None]
        return x[lo] * (1.0 - frac) + x[hi] * frac

    keys = jax.random.split(rng, B)
    return jax.vmap(warp_one)(spec, spec_lengths.astype(jnp.int32), keys)


def spec_aug_lfr(
    rng: jax.Array,
    spec: jnp.ndarray,  # (B, T, F) LFR features
    spec_lengths: jnp.ndarray,
    *,
    apply_time_warp: bool = False,
    time_warp_window: int = 5,
    apply_freq_mask: bool = True,
    freq_mask_width_range: Sequence[int] = (0, 30),
    num_freq_mask: int = 1,
    lfr_rate: int = 6,
    apply_time_mask: bool = True,
    time_mask_width_range: Sequence[int] = (0, 12),
    num_time_mask: int = 1,
    **unused,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    kf, kt, kw = jax.random.split(rng, 3)
    if apply_time_warp:
        spec = time_warp(kw, spec, spec_lengths, time_warp_window)
    if apply_freq_mask:
        # the reference passes lfr_rate + 1 (specaug.py:151): the stacked
        # copy count is lfr_m = lfr_rate + 1, so the band D = F // (rate+1)
        # is exactly one mel copy, replicated into every stacked copy
        spec = _mask_along_axis(
            kf, spec, 2, tuple(freq_mask_width_range), num_freq_mask,
            lfr_rate + 1 if lfr_rate else 1,
        )
    if apply_time_mask:
        spec = _mask_along_axis(
            kt, spec, 1, tuple(time_mask_width_range), num_time_mask, 1
        )
    return spec, spec_lengths


from funasr_tpu.registry import tables as _tables


@_tables.register("specaug_classes", "SpecAugLFR")
class SpecAugLFR:
    """Config-object wrapper over :func:`spec_aug_lfr` (reference
    funasr/models/specaug/specaug.py:106 ``SpecAugLFR``): holds the mask /
    warp settings from ``specaug_conf`` and applies them per batch with an
    explicit PRNG key."""

    def __init__(self, **conf):
        # accept the reference template.yaml keys verbatim
        self.conf = {k: v for k, v in conf.items() if k in (
            "apply_time_warp", "time_warp_window", "apply_freq_mask",
            "freq_mask_width_range", "num_freq_mask", "lfr_rate",
            "apply_time_mask", "time_mask_width_range", "num_time_mask")}

    def __call__(self, rng, spec, spec_lengths):
        return spec_aug_lfr(rng, spec, spec_lengths, **self.conf)


@_tables.register("specaug_classes", "SpecAug")
class SpecAug(SpecAugLFR):
    """Non-LFR SpecAug (reference specaug.py:17): identical masking with
    ``lfr_rate`` pinned to 1 so time masks are in raw-frame units."""

    def __init__(self, **conf):
        super().__init__(**conf)
        self.conf["lfr_rate"] = 1

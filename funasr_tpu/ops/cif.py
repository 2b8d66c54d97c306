"""Continuous Integrate-and-Fire (CIF), TPU-native.

The reference implements CIF three ways (funasr/models/paraformer/
cif_predictor.py): a per-frame Python loop (``cif``:625), a vectorized
cumsum/scatter version with float64 cumsum and data-dependent gather shapes
(``cif_v1``:696), and a streaming per-chunk loop.  None of those map to XLA:
the scatter/gather shapes depend on runtime fire counts.

TPU formulation
---------------
With threshold 1.0, CIF is exactly an *interval overlap* between the
cumulative-alpha line and the integer token grid: let ``S_t = sum(alpha[:t+1])``
and ``P_t = S_{t-1}``.  Frame ``t`` spans mass interval ``[P_t, S_t]``; token
``u`` owns mass interval ``[u, u+1)``.  The contribution of frame ``t`` to
token ``u`` is ``max(0, min(S_t, u+1) - max(P_t, u))`` — so the whole CIF is
one (B,U,T) weight tensor contracted with hidden on the MXU::

    embeds[b, u] = sum_t w[b, u, t] * hidden[b, t]

This is bit-for-bit the loop semantics whenever every ``alpha <= threshold``
(true for sigmoid alphas with smooth_factor 1), with two deliberate,
documented divergences from ``cif_v1``:

- a final token whose accumulation never crosses threshold still receives its
  partial mass (the reference emits a zero row); this only differs within
  float eps of a boundary after the training-time alpha rescale, and is
  batch-shape invariant,
- ``hidden`` must be pre-masked (pad frames zeroed), which makes the
  tail-threshold frame contribute zeros exactly like the reference's
  batch-size-1 path (cif_predictor.py:365 appends a zeros frame).

Precision: the reference needs float64 cumsum (cif_predictor.py:678-680).
TPUs have no fast f64, so we run a *compensated* (TwoSum) prefix sum via
``lax.associative_scan`` — error stays O(ulp) independent of T.

Static shapes: the output token grid is padded to ``max_tokens``; real counts
travel as ``token_num`` floats like the reference's predictor contract.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


def compensated_cumsum(x: jnp.ndarray, axis: int = -1):
    """Prefix sum with Kahan/TwoSum compensation.

    Returns ``(s, c)`` where the true prefix sum is ``s + c`` with error
    O(ulp(s)) regardless of length — the TPU-native replacement for the
    reference's float64 cumsum trick.
    """

    def combine(a, b):
        s1, c1 = a
        s2, c2 = b
        s = s1 + s2
        bp = s - s1
        e = (s1 - (s - bp)) + (s2 - bp)
        return s, c1 + c2 + e

    s, c = lax.associative_scan(combine, (x, jnp.zeros_like(x)), axis=axis)
    return s, c


class CifOutput(NamedTuple):
    embeds: jnp.ndarray  # (B, U, D) acoustic embeddings, zero-padded
    token_num: jnp.ndarray  # (B,) float: total integrated alpha
    fires: jnp.ndarray  # (B, T) reference-compatible fire track
    peaks: jnp.ndarray  # (B, T) bool: frame fired (token boundary)


def cif(hidden: jnp.ndarray, alphas: jnp.ndarray, max_tokens: int) -> CifOutput:
    """Integrate-and-fire with threshold 1.0 as one MXU contraction.

    Args:
      hidden: (B, T, D) frame features, **pre-masked** (pad frames zero).
      alphas: (B, T) nonnegative weights, **pre-masked** (pad frames zero),
        each `<= 1` (sigmoid-derived).
      max_tokens: static token-grid size U.

    Returns ``CifOutput``; ``fires`` matches the reference's
    ``cif_wo_hidden_v1`` (fire indicator + fractional accumulation).
    """
    if hidden.ndim != 3 or alphas.ndim != 2:
        raise ValueError(f"cif expects (B,T,D)/(B,T), got {hidden.shape}/{alphas.shape}")
    alphas = alphas.astype(jnp.float32)

    s, c = compensated_cumsum(alphas, axis=-1)
    S = s + c  # (B, T) inclusive prefix sum, ~1 ulp accurate
    P = S - alphas  # exclusive prefix sum

    # Fire track (reference cif_wo_hidden_v1 semantics): a frame fires when
    # the integer part of the prefix sum advances.
    floor_S = jnp.floor(S)
    floor_P = jnp.floor(P)
    peaks = floor_S > floor_P
    fires = peaks.astype(jnp.float32) + (S - floor_S)

    # Interval-overlap weights against the integer token grid.
    grid = lax.broadcasted_iota(jnp.float32, (1, max_tokens, 1), 1)  # (1,U,1)
    lo = jnp.maximum(P[:, None, :], grid)  # (B,U,T)
    hi = jnp.minimum(S[:, None, :], grid + 1.0)
    w = jnp.clip(hi - lo, 0.0, 1.0)

    embeds = jnp.einsum(
        "but,btd->bud", w, hidden.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    token_num = S[:, -1]
    # Reference cif (cif_predictor.py:625) emits only FIRED tokens and
    # zero-pads the grid: token u exists iff the integration crossed u+1.
    # Mask the trailing partial token (eps guards the training-time exact-
    # integer rescale against one-ulp shortfalls).
    n_fired = jnp.floor(token_num + 1e-4)
    u_idx = grid[..., 0]  # (1, U)
    valid = (u_idx < n_fired[:, None]).astype(jnp.float32)[:, :, None]
    embeds = embeds * valid
    return CifOutput(embeds.astype(hidden.dtype), token_num, fires, peaks)


def cif_tail(
    hidden: jnp.ndarray,
    alphas: jnp.ndarray,
    lengths: jnp.ndarray,
    tail_threshold: float,
):
    """Append the inference-time tail frame (reference ``tail_process_fn``,
    cif_predictor.py:346): one extra frame with alpha = ``tail_threshold`` at
    position ``lengths`` (the first pad slot) and a zero hidden vector, which
    pushes a trailing partial token over the fire threshold.

    Returns (hidden', alphas', token_num_floor) with T+1 frames.
    """
    b, t, d = hidden.shape
    pos = lax.broadcasted_iota(jnp.int32, (1, t + 1), 1)
    tail_onehot = (pos == lengths[:, None].astype(jnp.int32)).astype(alphas.dtype)
    alphas = jnp.pad(alphas, ((0, 0), (0, 1))) + tail_threshold * tail_onehot
    hidden = jnp.pad(hidden, ((0, 0), (0, 1), (0, 0)))
    token_num = jnp.floor(jnp.sum(alphas, axis=-1))
    return hidden, alphas, token_num


def cif_reference_scan(hidden: jnp.ndarray, alphas: jnp.ndarray, max_tokens: int):
    """Sequential scan CIF — the literal integrate-and-fire recurrence
    (reference ``cif``, cif_predictor.py:625) as a ``lax.scan``.  Used as the
    ground-truth oracle in tests; O(T) steps, slow, exact loop semantics.
    """
    B, T, D = hidden.shape
    threshold = 1.0

    def step(carry, xs):
        integrate, frame, count, out = carry
        alpha, h = xs  # (B,), (B,D)
        new_int = integrate + alpha
        fire = new_int >= threshold
        cur = jnp.where(fire, 1.0 - integrate, alpha)
        remainds = alpha - cur
        fired_frame = frame + cur[:, None] * h
        out_idx = jnp.clip(count, 0, max_tokens - 1)
        out = jnp.where(
            fire[:, None, None],
            out.at[jnp.arange(B), out_idx].set(fired_frame),
            out,
        )
        count = count + fire.astype(jnp.int32)
        integrate = jnp.where(fire, new_int - threshold, new_int)
        frame = jnp.where(fire[:, None], remainds[:, None] * h, fired_frame)
        return (integrate, frame, count, out), new_int

    init = (
        jnp.zeros((B,), jnp.float32),
        jnp.zeros((B, D), jnp.float32),
        jnp.zeros((B,), jnp.int32),
        jnp.zeros((B, max_tokens, D), jnp.float32),
    )
    (integrate, frame, count, out), fires = lax.scan(
        step,
        init,
        (alphas.astype(jnp.float32).T, jnp.swapaxes(hidden, 0, 1).astype(jnp.float32)),
    )
    return out, count, fires.T

"""RNN-T (transducer) loss as a lax.scan dynamic program.

The reference uses warp-rnnt/torchaudio CUDA kernels
(funasr/models/transducer).  Here the Graves forward algorithm runs as a
scan over time frames with a (B, U+1) alpha row carry:

    alpha(t, u) = logaddexp(alpha(t-1, u) + blank(t-1, u),
                            alpha(t, u-1) + emit(t, u-1))

The within-row recurrence ``a(u) = logaddexp(b(u), a(u-1) + e(u-1))`` is a
first-order linear recurrence, i.e. a composition of affine maps — evaluated
with ``lax.associative_scan`` over (log-gain, log-offset) pairs.  Total cost:
T scan steps of O(B * U log U) VPU work; fully jittable and differentiable
(the TPU-native replacement for a custom CUDA kernel).

Verified against a per-path numpy oracle in tests/test_transducer.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

NEG_INF = -1.0e30


def _logaddexp(a, b):
    mx = jnp.maximum(jnp.maximum(a, b), NEG_INF)
    return mx + jnp.log1p(jnp.exp(jnp.minimum(a, b) - mx))


def _row_update(b, e):
    """a(0) = b(0); a(u) = logaddexp(b(u), a(u-1) + e(u-1)) for u = 1..U.

    b: (B, U+1) time-transition scores into row positions;
    e: (B, U) within-row emission scores.  Affine-map composition in log
    space: element u has gain e(u-1) and offset b(u).
    """
    gains = e
    offsets = b[:, 1:]

    def combine(p, q):
        pg, po = p
        qg, qo = q
        return pg + qg, _logaddexp(qo, po + qg)

    g, o = lax.associative_scan(combine, (gains, offsets), axis=1)
    a_rest = _logaddexp(o, b[:, :1] + g)
    return jnp.concatenate([b[:, :1], a_rest], axis=1)


def rnnt_loss(
    logits: jnp.ndarray,  # (B, T, U+1, V) joint network outputs
    targets: jnp.ndarray,  # (B, U) int ids
    logit_lengths: jnp.ndarray,  # (B,) valid frames
    target_lengths: jnp.ndarray,  # (B,) valid tokens
    blank_id: int = 0,
) -> jnp.ndarray:
    """Mean negative log-likelihood over the batch."""
    B, T, U1, V = logits.shape
    U = U1 - 1
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    blank_lp = logp[..., blank_id]  # (B, T, U+1)
    tgt = jnp.clip(targets, 0, V - 1)
    emit_lp = jnp.take_along_axis(
        logp[:, :, :U, :], jnp.broadcast_to(tgt[:, None, :, None], (B, T, U, 1)),
        axis=-1,
    )[..., 0]  # (B, T, U): emit target token u while at (t, u)
    # emissions beyond each sequence's target length are illegal
    u_pos = lax.broadcasted_iota(jnp.int32, (1, 1, U), 2)
    emit_lp = jnp.where(u_pos < target_lengths[:, None, None], emit_lp, NEG_INF)

    init_b = jnp.full((B, U1), NEG_INF).at[:, 0].set(0.0)
    row0 = _row_update(init_b, emit_lp[:, 0, :])

    def step(carry, t):
        alpha, ll = carry
        # finish: sequences whose last valid frame is t-1 contribute
        # alpha(t-1, U_b) + blank(t-1, U_b)
        done_now = (t == logit_lengths)  # t is the next frame index
        final_here = (
            jnp.take_along_axis(alpha, target_lengths[:, None], axis=1)[:, 0]
            + jnp.take_along_axis(
                blank_lp[:, jnp.maximum(t - 1, 0), :],
                target_lengths[:, None], axis=1)[:, 0]
        )
        ll = jnp.where(done_now, final_here, ll)
        b = alpha + blank_lp[:, jnp.maximum(t - 1, 0), :]
        new_alpha = _row_update(b, emit_lp[:, jnp.minimum(t, T - 1), :])
        valid = (t < logit_lengths)[:, None]
        alpha = jnp.where(valid, new_alpha, alpha)
        return (alpha, ll), None

    (alpha, ll), _ = lax.scan(
        step, (row0, jnp.full((B,), NEG_INF)), jnp.arange(1, T + 1)
    )
    return -jnp.mean(ll)

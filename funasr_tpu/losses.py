"""Loss functions (reference funasr/losses/label_smoothing_loss.py,
funasr/models/paraformer/cif_predictor.py:609 ``mae_loss``,
funasr/metrics/compute_acc.py ``th_accuracy``)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax


def label_smoothing_loss(
    logits: jnp.ndarray,  # (B, U, V)
    targets: jnp.ndarray,  # (B, U) int ids, ignore_id at pads
    ignore_id: int = -1,
    smoothing: float = 0.0,
    normalize_length: bool = False,
) -> jnp.ndarray:
    """Label-smoothed KL-divergence loss, espnet semantics: the smoothed
    target puts ``smoothing/(V-1)`` on every off-target class, the KL keeps
    its constant entropy term, pad positions are dropped, and the sum is
    normalized by batch size (or token count when ``normalize_length``)."""
    B, U, V = logits.shape
    valid = targets != ignore_id
    tgt = jnp.where(valid, targets, 0)
    confidence = 1.0 - smoothing
    low = smoothing / (V - 1)

    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    # KL(true || pred) = sum_c true_c * (log true_c - logp_c)
    # split into the target column and the uniform remainder:
    logp_tgt = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    sum_logp = jnp.sum(logp, axis=-1)
    cross = -(confidence * logp_tgt + low * (sum_logp - logp_tgt))
    entropy = -(
        confidence * jnp.log(jnp.maximum(confidence, 1e-20))
        + (V - 1) * low * jnp.log(jnp.maximum(low, 1e-20))
    )
    kl = cross - entropy
    kl = jnp.where(valid, kl, 0.0)
    denom = jnp.sum(valid) if normalize_length else B
    return jnp.sum(kl) / jnp.maximum(denom, 1)


def th_accuracy(
    logits: jnp.ndarray, targets: jnp.ndarray, ignore_id: int = -1
) -> jnp.ndarray:
    """Token accuracy over non-ignored positions."""
    pred = jnp.argmax(logits, axis=-1)
    valid = targets != ignore_id
    correct = jnp.sum((pred == targets) & valid)
    return correct / jnp.maximum(jnp.sum(valid), 1)


def mae_length_loss(
    target_length: jnp.ndarray,
    pred_length: jnp.ndarray,
    normalize_length: bool = False,
) -> jnp.ndarray:
    """Predictor token-count L1 loss (cif_predictor.py:609)."""
    loss = jnp.sum(jnp.abs(target_length.astype(jnp.float32) - pred_length))
    denom = (
        jnp.sum(target_length).astype(jnp.float32)
        if normalize_length
        else target_length.shape[0]
    )
    return loss / jnp.maximum(denom, 1.0)


def ctc_loss(
    logits: jnp.ndarray,  # (B, T, V) encoder-frame logits
    logit_lengths: jnp.ndarray,  # (B,)
    targets: jnp.ndarray,  # (B, U), ignore_id padded
    target_lengths: jnp.ndarray,  # (B,)
    ignore_id: int = -1,
    blank_id: int = 0,
) -> jnp.ndarray:
    """CTC loss via optax (reference wraps torch builtin ctc, ctc/ctc.py:53);
    mean over batch, pads mapped to blank-padded label tensors."""
    B, T, V = logits.shape
    U = targets.shape[1]
    labels = jnp.where(targets == ignore_id, 0, targets)
    logit_pad = 1.0 - (jnp.arange(T)[None, :] < logit_lengths[:, None]).astype(jnp.float32)
    label_pad = 1.0 - (jnp.arange(U)[None, :] < target_lengths[:, None]).astype(jnp.float32)
    per_seq = optax.ctc_loss(
        logits.astype(jnp.float32), logit_pad, labels, label_pad, blank_id=blank_id
    )
    return jnp.mean(per_seq)

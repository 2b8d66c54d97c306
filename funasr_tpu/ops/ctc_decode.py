"""Device-resident CTC decoding primitives.

``ctc_greedy_decode`` is the batched argmax -> collapse-repeats -> drop-blank
path (reference sense_voice/model.py:899-906 does this per-utterance with
``unique_consecutive`` on the host).  Here it is one fused XLA program with
static shapes: surviving tokens are left-packed with an argsort trick.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax


def ctc_greedy_decode(
    log_probs: jnp.ndarray,  # (B, T, V)
    lengths: jnp.ndarray,  # (B,)
    blank_id: int = 0,
    pad_id: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (tokens (B, T) left-packed pad_id-padded, token_lengths (B,))."""
    B, T, V = log_probs.shape
    pred = jnp.argmax(log_probs, axis=-1)  # (B, T)
    valid = lax.broadcasted_iota(jnp.int32, (1, T), 1) < lengths[:, None]
    prev = jnp.concatenate([jnp.full((B, 1), -1, pred.dtype), pred[:, :-1]], axis=1)
    keep = (pred != prev) & (pred != blank_id) & valid
    # left-pack kept tokens: stable argsort of (not keep) moves kept first
    order = jnp.argsort(~keep, axis=1, stable=True)
    packed = jnp.take_along_axis(pred, order, axis=1)
    token_lengths = jnp.sum(keep, axis=1).astype(jnp.int32)
    pos = lax.broadcasted_iota(jnp.int32, (1, T), 1)
    packed = jnp.where(pos < token_lengths[:, None], packed, pad_id)
    return packed, token_lengths

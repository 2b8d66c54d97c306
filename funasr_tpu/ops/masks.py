"""Length-mask utilities.

Padded-batch discipline: every variable-length tensor travels with an int32
lengths vector; masks are derived on device.  Matches the semantics of the
reference's ``make_pad_mask``/``sequence_mask``
(funasr/models/transformer/utils/nets_utils.py, funasr/models/scama/utils.py)
but formulated as broadcasted-iota comparisons, which XLA fuses for free.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def sequence_mask(lengths: jnp.ndarray, maxlen: int, dtype=jnp.float32) -> jnp.ndarray:
    """(B,) lengths → (B, maxlen) mask, 1.0 for valid positions."""
    pos = lax.broadcasted_iota(jnp.int32, (1, maxlen), 1)
    return (pos < lengths[:, None].astype(jnp.int32)).astype(dtype)


def key_mask(lengths: jnp.ndarray, maxlen: int, dtype=jnp.float32) -> jnp.ndarray:
    """(B,) lengths → (B, 1, maxlen) attention key mask (1 valid)."""
    return sequence_mask(lengths, maxlen, dtype)[:, None, :]


def mask_fill(scores: jnp.ndarray, mask: jnp.ndarray, fill=None) -> jnp.ndarray:
    """Set positions where ``mask == 0`` to a large negative value.

    Uses the dtype's finite min rather than -inf so that fully-masked softmax
    rows stay NaN-free (the reference masks attn output to 0 afterwards; we
    do the same in the attention modules).
    """
    if fill is None:
        fill = jnp.finfo(scores.dtype).min
    return jnp.where(mask != 0, scores, jnp.asarray(fill, scores.dtype))

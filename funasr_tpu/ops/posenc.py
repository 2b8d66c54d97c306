"""Position encodings.

``sinusoidal_encoding`` reproduces the reference's ``SinusoidalPositionEncoder``
(funasr/models/transformer/embedding.py:383): positions start at 1, the
timescale uses ``depth/2 - 1`` in the denominator, and the encoding is
``concat([sin, cos], -1)`` (NOT interleaved).  Paraformer's SANM encoder adds
this at the *input feature* width (560 for LFR-stacked features), after
scaling the input by sqrt(d_model).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def sinusoidal_encoding(
    length: int, depth: int, start: int = 1, dtype=jnp.float32
) -> jnp.ndarray:
    """(length, depth) funasr-style sinusoidal position encoding."""
    positions = np.arange(start, start + length, dtype=np.float64)
    log_timescale_increment = np.log(10000.0) / (depth / 2 - 1)
    inv_timescales = np.exp(
        np.arange(depth // 2, dtype=np.float64) * -log_timescale_increment
    )
    scaled = positions[:, None] * inv_timescales[None, :]
    enc = np.concatenate([np.sin(scaled), np.cos(scaled)], axis=-1)
    return jnp.asarray(enc, dtype=dtype)


def transformer_encoding(length: int, depth: int, dtype=jnp.float32) -> jnp.ndarray:
    """Vaswani-style interleaved sin/cos encoding, positions from 0.

    Matches the reference ``PositionalEncoding``
    (funasr/models/transformer/embedding.py:36): pe[:, 0::2]=sin,
    pe[:, 1::2]=cos.
    """
    position = np.arange(0, length, dtype=np.float64)[:, None]
    div_term = np.exp(
        np.arange(0, depth, 2, dtype=np.float64) * -(np.log(10000.0) / depth)
    )
    pe = np.zeros((length, depth), dtype=np.float64)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return jnp.asarray(pe, dtype=dtype)

"""Feature normalization (reference funasr/models/normalize/{global_mvn,
utterance_mvn}.py)."""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp

from funasr_tpu.ops.masks import sequence_mask
from funasr_tpu.registry import tables


@tables.register("normalize_classes", "GlobalMVN")
class GlobalMVN:
    """Normalize with precomputed corpus statistics (stats npy/npz file with
    sum/sum-square/count rows, or mean/std arrays)."""

    def __init__(self, stats_file: Optional[str] = None,
                 norm_means: bool = True, norm_vars: bool = True,
                 eps: float = 1e-20, mean=None, std=None, **kwargs):
        self.norm_means = norm_means
        self.norm_vars = norm_vars
        if stats_file is not None:
            stats = np.load(stats_file)
            if isinstance(stats, np.lib.npyio.NpzFile):
                stats = stats[list(stats.keys())[0]]
            count = stats[0, -1]
            mean = stats[0, :-1] / count
            var = stats[1, :-1] / count - mean**2
            std = np.sqrt(np.maximum(var, eps))
        self.mean = jnp.asarray(mean) if mean is not None else None
        self.std = jnp.asarray(std) if std is not None else None

    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray):
        if self.norm_means and self.mean is not None:
            x = x - self.mean
        if self.norm_vars and self.std is not None:
            x = x / self.std
        return x, lengths


@tables.register("normalize_classes", "UtteranceMVN")
class UtteranceMVN:
    def __init__(self, norm_means: bool = True, norm_vars: bool = False,
                 eps: float = 1e-20, **kwargs):
        self.norm_means = norm_means
        self.norm_vars = norm_vars
        self.eps = eps

    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray):
        mask = sequence_mask(lengths, x.shape[1], x.dtype)[:, :, None]
        n = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)
        mean = jnp.sum(x * mask, axis=1, keepdims=True) / n
        if self.norm_means:
            x = (x - mean) * mask
        if self.norm_vars:
            var = jnp.sum(jnp.square(x) * mask, axis=1, keepdims=True) / n
            x = x / jnp.sqrt(jnp.maximum(var, self.eps))
        return x, lengths

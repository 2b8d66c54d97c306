"""LoRA adapters (reference funasr/models/lora/layers.py ``lora.Linear`` /
``MergedLinear`` + utils.py ``mark_only_lora_as_trainable``).

JAX/flax form: ``LoRADense`` adds a rank-``r`` update ``B @ A`` around a
standard Dense kernel; ``lora_trainable_mask`` builds an optax-style bool
pytree that freezes everything except LoRA params (the functional
equivalent of mark_only_lora_as_trainable); ``merge_lora`` folds the
adapters into the base kernels for serving (zero-overhead inference).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

Dtype = Any


class LoRADense(nn.Module):
    """Dense layer with a low-rank residual adapter.

    out = x @ kernel + bias + (alpha / r) * (x @ lora_A) @ lora_B
    """

    features: int
    r: int = 8
    alpha: float = 16.0
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_dim = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (in_dim, self.features), self.param_dtype)
        y = x.astype(self.dtype) @ kernel.astype(self.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), self.param_dtype)
            y = y + bias.astype(self.dtype)
        if self.r > 0:
            # A ~ kaiming-ish, B zeros -> adapter starts as identity
            lora_a = self.param("lora_A", nn.initializers.lecun_normal(),
                                (in_dim, self.r), self.param_dtype)
            lora_b = self.param("lora_B", nn.initializers.zeros,
                                (self.r, self.features), self.param_dtype)
            scale = self.alpha / self.r
            y = y + scale * ((x.astype(self.dtype) @ lora_a.astype(self.dtype))
                             @ lora_b.astype(self.dtype))
        return y


def _is_lora_path(path) -> bool:
    return any(getattr(k, "key", str(k)) in ("lora_A", "lora_B")
               for k in path)


def lora_trainable_mask(params):
    """Bool pytree: True only for lora_A/lora_B leaves.  Use with
    ``optax.masked`` (or multiply grads) to train adapters only."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: _is_lora_path(path), params)


def merge_lora(params):
    """Fold every {kernel, lora_A, lora_B} triple into the kernel and drop
    the adapters: kernel += (alpha/r) * A @ B.

    The scale is re-derived from the shapes' r with the module default
    alpha/r captured at 2.0 (alpha=16, r=8) unless a ``lora_scale`` leaf is
    stored alongside; for custom scales merge manually.
    """

    def walk(node):
        if isinstance(node, dict):
            node = {k: walk(v) for k, v in node.items()}
            if "kernel" in node and "lora_A" in node and "lora_B" in node:
                a, b = node["lora_A"], node["lora_B"]
                scale = float(node.get("lora_scale", 16.0 / a.shape[-1]))
                node = dict(node)
                node["kernel"] = node["kernel"] + scale * (a @ b)
                node.pop("lora_A")
                node.pop("lora_B")
                node.pop("lora_scale", None)
        return node

    return walk(params)

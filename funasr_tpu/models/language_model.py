"""Neural language models for shallow fusion (reference
funasr/models/language_model/transformer_lm.py:14 ``TransformerLM``).

``TransformerLM`` is a causal transformer over tokens; ``lm_log_probs``
produces next-token log-probs for every prefix position, which the beam
search mixes in with ``lm_weight`` (the reference's scorer composition,
transformer/search.py weights dict).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from funasr_tpu.models.sanm import LayerNormF32, PositionwiseFeedForward
from funasr_tpu.models.transformer.decoder import MultiHeadAttention
from funasr_tpu.ops.masks import sequence_mask
from funasr_tpu.ops.posenc import transformer_encoding
from funasr_tpu.registry import tables

Dtype = Any


class _LMLayer(nn.Module):
    size: int
    n_head: int
    linear_units: int
    dropout_rate: float = 0.1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, inputs, deterministic: bool = True):
        (mask,) = inputs
        res = x
        h = LayerNormF32(self.dtype, self.param_dtype, name="norm1")(x)
        h = MultiHeadAttention(self.n_head, self.size, 0.0, self.dtype,
                               self.param_dtype, name="self_attn"
                               )(h, h, mask, deterministic)
        x = res + nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        res = x
        h = LayerNormF32(self.dtype, self.param_dtype, name="norm2")(x)
        h = PositionwiseFeedForward(self.linear_units, self.size,
                                    self.dropout_rate, self.dtype,
                                    self.param_dtype, name="feed_forward"
                                    )(h, deterministic)
        return res + nn.Dropout(self.dropout_rate)(h, deterministic=deterministic), None


@tables.register("model_classes", "TransformerLM")
class TransformerLM(nn.Module):
    vocab_size: int
    embed_unit: int = 128
    att_unit: int = 256
    head: int = 2
    unit: int = 1024
    layer: int = 4
    dropout_rate: float = 0.1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, lengths: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        """tokens (B, L) -> next-token logits (B, L, V)."""
        B, L = tokens.shape
        x = nn.Embed(self.vocab_size, self.embed_unit, name="embed",
                     dtype=self.dtype, param_dtype=self.param_dtype)(tokens)
        x = nn.Dense(self.att_unit, name="input_layer", dtype=self.dtype,
                     param_dtype=self.param_dtype)(x)
        pe = transformer_encoding(L, self.att_unit)
        x = x * (self.att_unit ** 0.5) + pe[None].astype(x.dtype)

        causal = jnp.tril(jnp.ones((L, L), jnp.float32))[None, None]
        pad = sequence_mask(lengths, L, jnp.float32)[:, None, None, :]
        mask = causal * pad
        Stack = nn.scan(
            _LMLayer,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            length=self.layer,
            in_axes=(nn.broadcast, nn.broadcast),
        )
        x, _ = Stack(self.att_unit, self.head, self.unit, self.dropout_rate,
                     self.dtype, self.param_dtype, name="encoders"
                     )(x, (mask,), deterministic)
        x = LayerNormF32(self.dtype, self.param_dtype, name="after_norm")(x)
        return nn.Dense(self.vocab_size, name="decoder", dtype=self.dtype,
                        param_dtype=self.param_dtype)(x)

    def loss(self, tokens, lengths, sos: int = 1, eos: int = 2,
             deterministic: bool = False):
        """Standard next-token NLL over [sos]+y -> y+[eos]."""
        from funasr_tpu.models.transformer.model import add_sos_eos

        ys_in, ys_out, ys_lens = add_sos_eos(tokens, lengths, sos, eos)
        logits = self(ys_in, ys_lens, deterministic)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        tgt = jnp.where(ys_out == -1, 0, ys_out)
        nll = -jnp.take_along_axis(logp, tgt[..., None], -1)[..., 0]
        valid = ys_out != -1
        nll = jnp.where(valid, nll, 0.0)
        return jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)

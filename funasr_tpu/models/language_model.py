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
        return _lm_nll(self, tokens, lengths, sos, eos, deterministic)


def _lm_nll(lm: nn.Module, tokens, lengths, sos: int, eos: int,
            deterministic: bool):
    from funasr_tpu.models.transformer.model import add_sos_eos

    ys_in, ys_out, ys_lens = add_sos_eos(tokens, lengths, sos, eos)
    logits = lm(ys_in, ys_lens, deterministic)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
    tgt = jnp.where(ys_out == -1, 0, ys_out)
    nll = -jnp.take_along_axis(logp, tgt[..., None], -1)[..., 0]
    valid = ys_out != -1
    nll = jnp.where(valid, nll, 0.0)
    return jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)


@tables.register("model_classes", "SequentialRNNLM")
class SequentialRNNLM(nn.Module):
    """Recurrent LM (reference funasr/models/language_model/seq_rnn_lm.py:11
    ``SequentialRNNLM``): embed -> stacked LSTM/GRU/tanh-RNN -> vocab
    projection, optional tied embedding/output weights.

    The reference's per-hypothesis ``score`` carries RNN state between beam
    steps; on TPU the beam holds a fixed (N, L) token grid, so fusion
    re-scans the prefix under jit (``__call__`` over the padded grid) — the
    scan is one compiled program, state threading stays device-side, and the
    same module serves training (``loss``) and shallow fusion.
    """

    vocab_size: int
    unit: int = 650
    nhid: Optional[int] = None
    nlayers: int = 2
    dropout_rate: float = 0.0
    tie_weights: bool = False
    rnn_type: str = "lstm"
    ignore_id: int = 0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, lengths: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        """tokens (B, L) -> next-token logits (B, L, V)."""
        nhid = self.nhid or self.unit
        embed = nn.Embed(self.vocab_size, self.unit, name="encoder",
                         dtype=self.dtype, param_dtype=self.param_dtype)
        safe = jnp.where(tokens == self.ignore_id, 0, tokens)
        x = embed(safe)
        x = jnp.where((tokens == self.ignore_id)[..., None], 0.0, x)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        rnn_type = self.rnn_type.lower()
        for i in range(self.nlayers):
            if rnn_type == "lstm":
                cell = nn.OptimizedLSTMCell(nhid, dtype=self.dtype,
                                            param_dtype=self.param_dtype,
                                            name=f"rnn_{i}")
            elif rnn_type == "gru":
                cell = nn.GRUCell(nhid, dtype=self.dtype,
                                  param_dtype=self.param_dtype,
                                  name=f"rnn_{i}")
            elif rnn_type in ("rnn_tanh", "rnn_relu"):
                cell = nn.SimpleCell(
                    nhid, activation_fn=(nn.tanh if rnn_type == "rnn_tanh"
                                         else nn.relu),
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name=f"rnn_{i}")
            else:
                raise ValueError(f"rnn_type={self.rnn_type!r}")
            x = nn.RNN(cell)(x)
            if i < self.nlayers - 1:
                x = nn.Dropout(self.dropout_rate)(
                    x, deterministic=deterministic)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        if self.tie_weights:
            if nhid != self.unit:
                raise ValueError("tie_weights requires nhid == unit")
            logits = x @ embed.embedding.T.astype(x.dtype)
        else:
            logits = nn.Dense(self.vocab_size, name="decoder",
                              dtype=self.dtype,
                              param_dtype=self.param_dtype)(x)
        return logits

    def loss(self, tokens, lengths, sos: int = 1, eos: int = 2,
             deterministic: bool = False):
        """Standard next-token NLL over [sos]+y -> y+[eos]."""
        return _lm_nll(self, tokens, lengths, sos, eos, deterministic)

"""Transducer (RNN-T) ASR (reference funasr/models/transducer/:
``RNNTDecoder`` rnnt_decoder.py:15, ``JointNetwork`` joint_network.py:13,
beam search beam_search_transducer.py:48).

Encoder (any registered encoder; default Conformer) + LSTM prediction
network + additive joint.  Training uses the scan-based RNN-T loss
(funasr_tpu.ops.rnnt); decoding is a device-resident greedy loop
(``lax.scan`` over frames with a capped emissions-per-frame inner step),
replacing the reference's Python label-loop.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
from jax import lax

from funasr_tpu.models.conformer import ConformerEncoder
from funasr_tpu.ops.masks import sequence_mask
from funasr_tpu.ops.rnnt import rnnt_loss
from funasr_tpu.registry import tables

Dtype = Any


class RNNTDecoder(nn.Module):
    """LSTM prediction network over (blank-prepended) token history."""

    vocab_size: int
    embed_size: int = 256
    hidden_size: int = 256
    num_layers: int = 1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        self.embed = nn.Embed(self.vocab_size, self.embed_size, name="embed",
                              dtype=self.dtype, param_dtype=self.param_dtype)
        self.rnns = [
            nn.RNN(nn.OptimizedLSTMCell(self.hidden_size), name=f"lstm{i}")
            for i in range(self.num_layers)
        ]

    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        """(B, U) token ids -> (B, U, H) prediction states (full sequence)."""
        x = self.embed(tokens)
        for rnn in self.rnns:
            x = rnn(x)
        return x

    def init_state(self, batch: int):
        rng = jax.random.PRNGKey(0)
        return [
            rnn.cell.initialize_carry(rng, (batch, self.embed_size))
            for rnn in self.rnns
        ]

    def step(self, state, token: jnp.ndarray):
        """One prediction step: (state, (B,) token) -> (state, (B, H))."""
        x = self.embed(token)
        new_state = []
        for rnn, st in zip(self.rnns, state):
            st2, x = rnn.cell(st, x)
            new_state.append(st2)
        return new_state, x


class JointNetwork(nn.Module):
    """tanh(W_enc h_t + W_dec g_u) -> vocab (joint_network.py:13)."""

    vocab_size: int
    joint_size: int = 256
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, enc: jnp.ndarray, dec: jnp.ndarray) -> jnp.ndarray:
        """enc (..., De), dec (..., Dd) broadcastable -> (..., V)."""
        # lin_dec is bias-free like the reference (joint_network.py:38)
        h = (nn.Dense(self.joint_size, name="lin_enc", dtype=self.dtype,
                      param_dtype=self.param_dtype)(enc)
             + nn.Dense(self.joint_size, name="lin_dec", use_bias=False,
                        dtype=self.dtype,
                        param_dtype=self.param_dtype)(dec))
        return nn.Dense(self.vocab_size, name="lin_out", dtype=self.dtype,
                        param_dtype=self.param_dtype)(jnp.tanh(h))


@tables.register("model_classes", "Transducer")
class Transducer(nn.Module):
    vocab_size: int
    input_size: int = 80
    encoder_conf: Dict[str, Any] = None
    decoder_conf: Dict[str, Any] = None
    joint_conf: Dict[str, Any] = None
    blank_id: int = 0
    ignore_id: int = -1
    max_symbols_per_frame: int = 3
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def make_encoder(self):
        """Factory hook; RWKV-BAT swaps in the RWKV encoder."""
        conf = dict(self.encoder_conf or {})
        conf.setdefault("input_layer", "conv2d")
        return ConformerEncoder(
            input_size=self.input_size, dtype=self.dtype,
            param_dtype=self.param_dtype, name="encoder", **conf,
        )

    def setup(self):
        self.encoder = self.make_encoder()
        self.decoder = RNNTDecoder(
            vocab_size=self.vocab_size, dtype=self.dtype,
            param_dtype=self.param_dtype, name="decoder",
            **(self.decoder_conf or {}),
        )
        self.joint_network = JointNetwork(
            vocab_size=self.vocab_size, dtype=self.dtype,
            param_dtype=self.param_dtype, name="joint_network",
            **(self.joint_conf or {}),
        )

    def __call__(self, speech, speech_lengths, text, text_lengths,
                 deterministic: bool = False):
        """RNN-T training loss."""
        enc, enc_lens = self.encoder(speech, speech_lengths, deterministic)
        B, U = text.shape
        tokens = jnp.where(text == self.ignore_id, self.blank_id, text)
        # prediction net over [blank] + targets
        dec_in = jnp.concatenate(
            [jnp.full((B, 1), self.blank_id, tokens.dtype), tokens], axis=1)
        dec_out = self.decoder(dec_in)  # (B, U+1, H)
        logits = self.joint_network(enc[:, :, None, :], dec_out[:, None, :, :])
        loss = rnnt_loss(logits, tokens, enc_lens, text_lengths, self.blank_id)
        return loss, {"loss": loss}

    def logits_grid(self, speech, speech_lengths, tokens):
        """Full (B, T, U+1, V) joint grid over [blank]+tokens — the tensor
        the RNN-T loss consumes; exposed for parity/debugging."""
        enc, enc_lens = self.encoder(speech, speech_lengths, True)
        B = tokens.shape[0]
        dec_in = jnp.concatenate(
            [jnp.full((B, 1), self.blank_id, tokens.dtype), tokens], axis=1)
        dec_out = self.decoder(dec_in)
        logits = self.joint_network(enc[:, :, None, :],
                                    dec_out[:, None, :, :])
        return logits, enc_lens

    def greedy_decode(self, speech, speech_lengths, max_tokens: int = 128):
        """Device greedy decode: scan over frames, up to
        ``max_symbols_per_frame`` emissions per frame."""
        enc, enc_lens = self.encoder(speech, speech_lengths, True)
        B, T, _ = enc.shape
        state0 = self.decoder.init_state(B)
        # carry the post-blank LSTM state: training runs the prediction net
        # over [blank]+targets, so the first emission must be fed to the
        # state AFTER consuming blank, not the zero state
        state0, g0 = self.decoder.step(
            state0, jnp.full((B,), self.blank_id, jnp.int32))

        def frame_step(carry, t):
            state, g, last_tok, out, count = carry
            h_t = enc[:, t, :]

            def emit_once(c, _):
                state, g, last_tok, out, count = c
                logits = self.joint_network(h_t, g)
                tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                is_blank = tok == self.blank_id
                frame_valid = t < enc_lens
                emit = (~is_blank) & frame_valid & (count < max_tokens)
                idx = jnp.clip(count, 0, max_tokens - 1)
                out = jnp.where(
                    emit[:, None],
                    out.at[jnp.arange(B), idx].set(tok), out)
                count = count + emit.astype(jnp.int32)
                new_state, new_g = self.decoder.step(state, tok)
                # advance the prediction net only where we emitted
                state = jax.tree_util.tree_map(
                    lambda n, o: jnp.where(
                        emit.reshape((B,) + (1,) * (n.ndim - 1)), n, o),
                    new_state, state)
                g = jnp.where(emit[:, None], new_g, g)
                last_tok = jnp.where(emit, tok, last_tok)
                return (state, g, last_tok, out, count), None

            c = (state, g, last_tok, out, count)
            for _ in range(self.max_symbols_per_frame):
                c, _ = emit_once(c, None)
            return c, None

        out0 = jnp.zeros((B, max_tokens), jnp.int32)
        carry = (state0, g0, jnp.full((B,), self.blank_id, jnp.int32),
                 out0, jnp.zeros((B,), jnp.int32))
        carry, _ = lax.scan(frame_step, carry, jnp.arange(T))
        _, _, _, out, count = carry
        return out, count

"""LLM-ASR: speech encoder + adaptor + causal LLM decoder (reference
funasr/models/llm_asr/model.py:27,348 and adaptor.py — the speech-encoder/
adaptor/LLM stacks behind Qwen-Audio-style audio LLMs; llm_asr_nar is the
non-autoregressive variant).

Structure here:

- **encoder**: any registered encoder (default SANM) over fbank features;
- **adaptor** (reference adaptor.py ``EncoderProjectorConcat``): stack ``k``
  consecutive encoder frames and project to the LLM width — a static
  reshape + matmul, the MXU-friendly form of the reference's conv
  downsampler;
- **LLM**: a causal transformer consuming ``[audio embeds][sos][text]`` as
  one sequence.  Audio positions act as a (per-sample variable-length)
  prefix: every query may attend to all valid audio keys, text keys are
  causal.  With local weights for a real LLM this module's decoder stack is
  replaced by the converted checkpoint; the graph and masking are identical.

Training: CE on text positions.  Inference: jitted fixed-length greedy
scan (full recompute per step — serving would reuse the paraformer
streaming KV-ring machinery).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn
from jax import lax

from funasr_tpu.models.sanm import (
    LayerNormF32,
    PositionwiseFeedForward,
    SANMEncoder,
    masked_softmax,
)
from funasr_tpu.ops.masks import sequence_mask
from funasr_tpu.ops.posenc import transformer_encoding
from funasr_tpu.registry import tables

Dtype = Any


@tables.register("adaptor_classes", "Linear")
class Adaptor(nn.Module):
    """Frame-stacking projector (reference llm_asr/adaptor.py:10 ``Linear``,
    registered as adaptor "Linear"): stack ``k`` frames (remainder frames
    discarded, adaptor.py:21-23) -> Dense -> relu -> Dense(llm_dim)."""

    k: int = 5
    hidden: int = 2048
    llm_dim: int = 512
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray):
        B, T, D = x.shape
        Tk = (T // self.k) * self.k
        x = x[:, :Tk].reshape(B, Tk // self.k, D * self.k)
        h = nn.Dense(self.hidden, name="linear1", dtype=self.dtype,
                     param_dtype=self.param_dtype)(x)
        h = nn.relu(h)
        h = nn.Dense(self.llm_dim, name="linear2", dtype=self.dtype,
                     param_dtype=self.param_dtype)(h)
        return h, lengths // self.k


@tables.register("adaptor_classes", "Transformer")
class TransformerAdaptor(nn.Module):
    """Frame-stacking projector + transformer refiner (reference
    llm_asr/adaptor.py:93 ``Transformer``): ceil-pad to a multiple of ``k``,
    stack+project like Linear, then ``n_layer`` pre-norm MHA/FFN(llm_dim//4)
    layers at the LLM width."""

    k: int = 2
    hidden: int = 2048
    llm_dim: int = 512
    n_layer: int = 2
    heads: int = 8
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray,
                 deterministic: bool = True):
        from funasr_tpu.ops.masks import key_mask

        B, T, D = x.shape
        chunks = (T - 1) // self.k + 1
        x = jnp.pad(x, ((0, 0), (0, chunks * self.k - T), (0, 0)))
        x = x.reshape(B, chunks, D * self.k)
        h = nn.Dense(self.hidden, name="linear1", dtype=self.dtype,
                     param_dtype=self.param_dtype)(x)
        h = nn.relu(h)
        h = nn.Dense(self.llm_dim, name="linear2", dtype=self.dtype,
                     param_dtype=self.param_dtype)(h)
        out_lens = (lengths - 1) // self.k + 1
        mask = key_mask(out_lens, chunks, jnp.float32)[:, None, :, :]
        from funasr_tpu.models.transformer.decoder import MultiHeadAttention

        for i in range(self.n_layer):
            res = h
            y = LayerNormF32(self.dtype, self.param_dtype,
                             name=f"norm1_{i}")(h)
            y = MultiHeadAttention(self.heads, self.llm_dim,
                                   self.dropout_rate, self.dtype,
                                   self.param_dtype, name=f"self_attn_{i}"
                                   )(y, y, mask, deterministic)
            h = res + y
            res = h
            y = LayerNormF32(self.dtype, self.param_dtype,
                             name=f"norm2_{i}")(h)
            y = PositionwiseFeedForward(self.llm_dim // 4, self.llm_dim,
                                        self.dropout_rate, self.dtype,
                                        self.param_dtype,
                                        name=f"feed_forward_{i}"
                                        )(y, deterministic)
            h = res + y
        return h, out_lens


@tables.register("adaptor_classes", "QFormer")
class QFormerAdaptor(nn.Module):
    """Query-former projector (reference llm_asr/adaptor.py:36
    ``EncoderProjectorQFormer``): the input is split into fixed windows
    (~1/90 of the sequence each, adaptor.py:58-63), ``query_len`` learned
    queries cross-attend to each window through ``n_layer`` transformer
    layers, and the query outputs are projected + layer-normed to the LLM
    width — output length = n_windows * query_len, independent of T."""

    llm_dim: int = 512
    query_len: int = 8
    qformer_dim: int = 256
    n_layer: int = 2
    heads: int = 4
    n_windows: int = 4
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray,
                 deterministic: bool = True):
        from funasr_tpu.models.transformer.decoder import MultiHeadAttention

        B, T, D = x.shape
        W = self.n_windows
        win = (T - 1) // W + 1
        x = jnp.pad(x, ((0, 0), (0, W * win - T), (0, 0)))
        xw = x.reshape(B * W, win, D)
        q = self.param("query", nn.initializers.normal(1.0),
                       (1, self.query_len, self.qformer_dim),
                       self.param_dtype)
        h = jnp.broadcast_to(q.astype(self.dtype),
                             (B * W, self.query_len, self.qformer_dim))
        # window-content key mask from utterance lengths
        pos = jnp.arange(W * win).reshape(W, win)
        valid = (pos[None] < lengths[:, None, None]).reshape(B * W, 1, 1, win)
        for i in range(self.n_layer):
            res = h
            y = LayerNormF32(self.dtype, self.param_dtype,
                             name=f"norm_q_{i}")(h)
            y = MultiHeadAttention(self.heads, self.qformer_dim, 0.0,
                                   self.dtype, self.param_dtype,
                                   name=f"self_attn_{i}"
                                   )(y, y, None, deterministic)
            h = res + y
            res = h
            y = LayerNormF32(self.dtype, self.param_dtype,
                             name=f"norm_x_{i}")(h)
            kv = nn.Dense(self.qformer_dim, name=f"kv_proj_{i}",
                          dtype=self.dtype, param_dtype=self.param_dtype)(xw)
            y = MultiHeadAttention(self.heads, self.qformer_dim, 0.0,
                                   self.dtype, self.param_dtype,
                                   name=f"cross_attn_{i}"
                                   )(y, kv, valid.astype(jnp.float32),
                                     deterministic)
            h = res + y
            res = h
            y = LayerNormF32(self.dtype, self.param_dtype,
                             name=f"norm_f_{i}")(h)
            y = PositionwiseFeedForward(self.qformer_dim * 4,
                                        self.qformer_dim, 0.0, self.dtype,
                                        self.param_dtype,
                                        name=f"feed_forward_{i}"
                                        )(y, deterministic)
            h = res + y
        out = nn.Dense(self.llm_dim, name="linear", dtype=self.dtype,
                       param_dtype=self.param_dtype)(h)
        out = LayerNormF32(self.dtype, self.param_dtype, name="norm")(out)
        out = out.reshape(B, W * self.query_len, self.llm_dim)
        return out, jnp.full((B,), W * self.query_len, jnp.int32)


class _CausalLayer(nn.Module):
    size: int
    n_head: int
    ffn: int
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, inputs, deterministic: bool = True):
        (mask,) = inputs  # (B, 1, L, L)
        B, L, _ = x.shape
        d_k = self.size // self.n_head
        res = x
        h = LayerNormF32(self.dtype, self.param_dtype, name="norm1")(x)
        qkv = nn.Dense(3 * self.size, name="qkv", dtype=self.dtype,
                       param_dtype=self.param_dtype)(h)
        q, k, v = jnp.split(qkv, 3, -1)
        q = q.reshape(B, L, self.n_head, d_k) * (d_k ** -0.5)
        k = k.reshape(B, L, self.n_head, d_k)
        v = v.reshape(B, L, self.n_head, d_k)
        scores = jnp.einsum("bthd,bshd->bhts", q, k)
        attn = masked_softmax(scores, mask)
        ctx = jnp.einsum("bhts,bshd->bthd", attn.astype(v.dtype), v)
        h = nn.Dense(self.size, name="out", dtype=self.dtype,
                     param_dtype=self.param_dtype)(ctx.reshape(B, L, self.size))
        x = res + nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        res = x
        h = LayerNormF32(self.dtype, self.param_dtype, name="norm2")(x)
        h = PositionwiseFeedForward(self.ffn, self.size, self.dropout_rate,
                                    self.dtype, self.param_dtype,
                                    name="feed_forward")(h, deterministic)
        return res + nn.Dropout(self.dropout_rate)(h,
                                                   deterministic=deterministic), None


@tables.register("model_classes", "LLMASR")
class LLMASR(nn.Module):
    vocab_size: int
    input_size: int = 560
    encoder_conf: Optional[Dict] = None
    adaptor: str = "Linear"  # adaptor_classes registry name
    adaptor_conf: Optional[Dict] = None
    llm_conf: Optional[Dict] = None
    sos: int = 1
    eos: int = 2
    ignore_id: int = -1
    use_encoder: bool = True  # False: inputs are already encoder states
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        if self.use_encoder:
            enc_conf = dict(self.encoder_conf or {})
            enc_conf.setdefault("output_size", 256)
            self.encoder = SANMEncoder(
                input_size=self.input_size, dtype=self.dtype,
                param_dtype=self.param_dtype, name="encoder", **enc_conf)
        import dataclasses

        ad_conf = dict(self.adaptor_conf or {})
        llm_conf = dict(self.llm_conf or {})
        self.llm_dim = llm_conf.get("dim", 512)
        ad_conf.setdefault("llm_dim", self.llm_dim)
        # reference adaptor kwarg names (adaptor.py ctor signature)
        if "downsample_rate" in ad_conf:
            ad_conf["k"] = ad_conf.pop("downsample_rate")
        if "ffn_dim" in ad_conf:
            ad_conf["hidden"] = ad_conf.pop("ffn_dim")
        ad_cls = tables.get("adaptor_classes", self.adaptor)
        fields = {f.name for f in dataclasses.fields(ad_cls)}
        ad_conf = {k: v for k, v in ad_conf.items() if k in fields}
        self.adaptor_module = ad_cls(dtype=self.dtype,
                                     param_dtype=self.param_dtype,
                                     name="adaptor", **ad_conf)
        self.n_layers = llm_conf.get("layers", 4)
        self.n_head = llm_conf.get("heads", 8)
        self.ffn = llm_conf.get("ffn", 4 * self.llm_dim)
        # llm_conf["type"]="qwen2" swaps the LLM half for the real Qwen2
        # decoder architecture (models/llm_asr/qwen.py) so converted HF
        # Qwen2ForCausalLM weights load with logit parity — the
        # reference's hub-checkpoint LLM (funasr/models/llm_asr/model.py:27)
        self.llm_type = llm_conf.get("type", "transformer")
        if self.llm_type == "qwen2":
            from funasr_tpu.models.llm_asr.qwen import Qwen2LM

            self.qwen = Qwen2LM(
                vocab_size=self.vocab_size, dim=self.llm_dim,
                layers=self.n_layers, heads=self.n_head,
                kv_heads=llm_conf.get("kv_heads"),
                ffn=llm_conf.get("ffn"),
                rope_theta=llm_conf.get("rope_theta", 1000000.0),
                rms_eps=llm_conf.get("rms_eps", 1e-6),
                tie_word_embeddings=llm_conf.get(
                    "tie_word_embeddings", False),
                dtype=self.dtype, param_dtype=self.param_dtype,
                name="llm")
        else:
            self.embed = nn.Embed(self.vocab_size, self.llm_dim,
                                  name="embed", dtype=self.dtype,
                                  param_dtype=self.param_dtype)
            self.lm_head = nn.Dense(self.vocab_size, name="lm_head",
                                    dtype=self.dtype,
                                    param_dtype=self.param_dtype)
            Stack = nn.scan(
                _CausalLayer,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                length=self.n_layers,
                in_axes=(nn.broadcast, nn.broadcast),
            )
            self.llm_layers = Stack(self.llm_dim, self.n_head, self.ffn,
                                    0.0, self.dtype, self.param_dtype,
                                    name="llm_layers")
            self.llm_norm = LayerNormF32(self.dtype, self.param_dtype,
                                         name="llm_norm")

    def _embed_ids(self, ids):
        if self.llm_type == "qwen2":
            return self.qwen.embed(ids)
        return self.embed(ids)

    def _llm(self, embeds, mask, deterministic):
        if self.llm_type == "qwen2":
            # rotary positions are handled inside the Qwen stack
            return self.qwen(embeds, mask, deterministic=deterministic)
        L = embeds.shape[1]
        pe = transformer_encoding(L, self.llm_dim)
        x = embeds + pe[None].astype(embeds.dtype)
        x, _ = self.llm_layers(x, (mask,), deterministic)
        x = self.llm_norm(x)
        return self.lm_head(x)

    def _prefix_mask(self, audio_lens, Ta, text_valid_len, Lt):
        """(B, 1, L, L) mask: audio keys visible to everyone (prefix-LM),
        text keys causal; invalid positions masked out."""
        L = Ta + Lt
        pos = jnp.arange(L)
        audio_valid = (pos[None, :] < audio_lens[:, None]) & (pos[None, :] < Ta)
        text_valid = (pos[None, :] >= Ta) & (
            pos[None, :] < Ta + text_valid_len[:, None])
        causal = pos[None, :] <= pos[:, None]  # (L, L) query x key
        m = audio_valid[:, None, :] | (text_valid[:, None, :] & causal[None])
        return m[:, None, :, :].astype(jnp.float32)

    def _audio_prefix(self, speech, speech_lengths, deterministic):
        if self.use_encoder:
            enc, enc_lens = self.encoder(speech, speech_lengths,
                                         deterministic)
        else:
            enc, enc_lens = speech, speech_lengths
        return self.adaptor_module(enc, enc_lens)

    def __call__(self, speech, speech_lengths, text, text_lengths,
                 deterministic: bool = False):
        """CE loss on text tokens given the audio prefix."""
        audio, audio_lens = self._audio_prefix(speech, speech_lengths,
                                               deterministic)
        B, Ta, _ = audio.shape
        U = text.shape[1]
        valid = sequence_mask(text_lengths, U, jnp.bool_)
        y = jnp.where(valid, text, self.eos)
        ys_in = jnp.concatenate(
            [jnp.full((B, 1), self.sos, text.dtype), y], axis=1)  # (B, U+1)
        embeds = jnp.concatenate([audio, self._embed_ids(ys_in)], axis=1)
        mask = self._prefix_mask(audio_lens, Ta, text_lengths + 1, U + 1)
        logits = self._llm(embeds, mask, deterministic)
        # next-token targets at text positions: logits[Ta + j] predicts y[j]
        lg = logits[:, Ta: Ta + U + 1]
        pos = jnp.arange(U + 1)[None, :]
        tgt = jnp.concatenate([y, jnp.full((B, 1), self.eos, text.dtype)], 1)
        tgt_valid = pos <= text_lengths[:, None]
        logp = jax.nn.log_softmax(lg.astype(jnp.float32), -1)
        nll = -jnp.take_along_axis(logp, tgt[..., None], -1)[..., 0]
        nll = jnp.where(tgt_valid, nll, 0.0)
        loss = jnp.sum(nll) / jnp.maximum(jnp.sum(tgt_valid), 1)
        acc = jnp.sum(
            jnp.where(tgt_valid, (jnp.argmax(lg, -1) == tgt), False)
        ) / jnp.maximum(jnp.sum(tgt_valid), 1)
        return loss, {"loss": loss, "acc": acc}

    def greedy_decode(self, speech, speech_lengths, maxlen: int = 32):
        """Fixed-length jitted greedy generation -> (tokens, lengths)."""
        audio, audio_lens = self._audio_prefix(speech, speech_lengths, True)
        B, Ta, _ = audio.shape
        sos_col = jnp.full((B, 1), self.sos, jnp.int32)

        def step(tokens, i):
            # tokens: (B, 1+maxlen) = [sos, generated..., pad]
            embeds = jnp.concatenate([audio, self._embed_ids(tokens)],
                                     axis=1)
            mask = self._prefix_mask(
                audio_lens, Ta,
                jnp.full((B,), 1, jnp.int32) + i + 1, 1 + maxlen)
            logits = self._llm(embeds, mask, True)
            nxt = jnp.argmax(logits[:, Ta + i], -1).astype(jnp.int32)
            tokens = tokens.at[:, i + 1].set(nxt)
            return tokens, nxt

        tokens0 = jnp.concatenate(
            [sos_col, jnp.zeros((B, maxlen), jnp.int32)], axis=1)
        tokens, outs = lax.scan(step, tokens0, jnp.arange(maxlen))
        gen = tokens[:, 1:]
        is_eos = gen == self.eos
        any_eos = jnp.any(is_eos, axis=1)
        first_eos = jnp.argmax(is_eos, axis=1)
        lengths = jnp.where(any_eos, first_eos, maxlen)
        return gen, lengths


def splice_audio_embeds(inputs_embeds: jnp.ndarray,
                        encoder_out: jnp.ndarray,
                        fbank_beg: jnp.ndarray,
                        fake_token_len: jnp.ndarray) -> jnp.ndarray:
    """Write audio embeddings over the ``<|startofspeech|>`` placeholder
    spans of a chat token sequence (reference llm_asr/model.py:509-526 /
    :1010-1040 — the per-batch python splice loop, here a vectorized
    masked gather).

    inputs_embeds (B, L, D): token embeddings of the chat sequence;
    encoder_out (S, Ta, D): adaptor outputs, one row per AUDIO SPAN,
    flattened in (batch, turn) order over spans with ``fbank_beg > 0``
    (the reference's ``speech_idx`` walk); fbank_beg / fake_token_len
    (B, n_turns): span start position and length in the token sequence.
    """
    B, L, _ = inputs_embeds.shape
    n_turns = fbank_beg.shape[1]
    active = (fbank_beg > 0).reshape(-1)
    sidx = (jnp.cumsum(active.astype(jnp.int32)) - 1).reshape(B, n_turns)
    pos = jnp.arange(L)
    out = inputs_embeds
    for t in range(n_turns):  # n_turns is small and static
        beg = fbank_beg[:, t][:, None]
        ln = fake_token_len[:, t][:, None]
        sel = (pos[None] >= beg) & (pos[None] < beg + ln) & (beg > 0)
        src = encoder_out[jnp.clip(sidx[:, t], 0,
                                   encoder_out.shape[0] - 1)]  # (B, Ta, D)
        off = jnp.clip(pos[None] - beg, 0, encoder_out.shape[1] - 1)
        row = jnp.take_along_axis(src, off[..., None], axis=1)
        out = jnp.where(sel[..., None], row.astype(out.dtype), out)
    return out


@tables.register("model_classes", "LLMASR2")
class LLMASR2(LLMASR):
    """ChatML-template audio LLM (reference llm_asr/model.py:349
    ``LLMASR2``): the prompt is a full chat sequence containing
    ``<|startofspeech|>...<|endofspeech|>`` spans; the audio encoder +
    adaptor outputs are SPLICED into the token-embedding sequence at the
    span positions (not prepended as a prefix like LLMASR), and the loss
    is the HF causal-LM objective — shift-by-one CE over ``labels_ids``
    with negative labels ignored (the -100 convention).

    The reference wires a HF ``AutoModelForCausalLM`` (vicuna/qwen) here;
    this class reuses LLMASR's LLM half (``llm_conf.type="qwen2"`` for the
    real converted-checkpoint Qwen2 architecture).  Host-side chat
    assembly (template split, placeholder token spans, fbank_beg/
    fake_token_len) lives in models/llm_asr/chat.py, the TPU-side splice
    above.
    """

    def __call__(self, speech, speech_lengths, input_ids, attention_mask,
                 labels_ids, fbank_beg, fake_token_len=None,
                 fbank_mask=None, deterministic: bool = False):
        """speech (S, T, F) fbank per audio span (S = total spans);
        input_ids/attention_mask/labels_ids (B, L); fbank_beg (B, n_turns);
        fake_token_len (B, n_turns) or fbank_mask (B, L) (the LLMASR2
        reference passes a mask, LLMASR4 per-turn lengths)."""
        audio, audio_lens = self._audio_prefix(speech, speech_lengths,
                                               deterministic)
        if fake_token_len is None:
            if fbank_mask is None:
                raise ValueError("need fake_token_len or fbank_mask")
            fake_token_len = jnp.sum(
                jnp.maximum(fbank_mask, 0), axis=-1, keepdims=True
            ).astype(jnp.int32)
        ids = jnp.maximum(input_ids, 0)
        embeds = self._embed_ids(ids)
        embeds = splice_audio_embeds(embeds, audio, fbank_beg,
                                     fake_token_len)
        logits = self._chat_llm(embeds, attention_mask, deterministic)
        # HF causal-LM loss: logits[:, :-1] predict labels[:, 1:]
        tgt = labels_ids[:, 1:]
        lg = logits[:, :-1]
        valid = tgt >= 0
        tgt0 = jnp.where(valid, tgt, 0)
        logp = jax.nn.log_softmax(lg.astype(jnp.float32), -1)
        nll = -jnp.take_along_axis(logp, tgt0[..., None], -1)[..., 0]
        nll = jnp.where(valid, nll, 0.0)
        n = jnp.maximum(jnp.sum(valid), 1)
        loss = jnp.sum(nll) / n
        acc = jnp.sum(jnp.where(valid, jnp.argmax(lg, -1) == tgt0,
                                False)) / n
        return loss, {"loss": loss, "acc": acc}

    def _chat_llm(self, embeds, attention_mask, deterministic):
        B, L, _ = embeds.shape
        pos = jnp.arange(L)
        causal = (pos[None, :] <= pos[:, None])[None]  # (1, L, L)
        keys = (jnp.maximum(attention_mask, 0) > 0)[:, None, :]  # (B, 1, L)
        mask = (causal & keys)[:, None].astype(jnp.float32)  # (B, 1, L, L)
        return self._llm(embeds, mask, deterministic)

    def chat_decode(self, speech, speech_lengths, input_ids, input_lengths,
                    fbank_beg, fake_token_len, maxlen: int = 32):
        """Greedy continuation after the chat prompt -> (tokens (B, maxlen),
        lengths).  Full recompute per step (parity/testing surface; the
        serving path would thread the cached scorer)."""
        audio, _ = self._audio_prefix(speech, speech_lengths, True)
        B, L = input_ids.shape
        total = L + maxlen
        ids0 = jnp.concatenate(
            [jnp.maximum(input_ids, 0),
             jnp.zeros((B, maxlen), input_ids.dtype)], axis=1)

        def step(ids, i):
            embeds = self._embed_ids(ids)
            embeds = splice_audio_embeds(embeds, audio, fbank_beg,
                                         fake_token_len)
            am = (jnp.arange(total)[None, :]
                  < (input_lengths + i)[:, None]).astype(jnp.int32)
            logits = self._chat_llm(embeds, am, True)
            last = jnp.take_along_axis(
                logits, (input_lengths + i - 1)[:, None, None], axis=1
            )[:, 0]
            nxt = jnp.argmax(last, -1).astype(ids.dtype)
            ids = jax.vmap(
                lambda row, p, v: row.at[p].set(v)
            )(ids, input_lengths + i, nxt)
            return ids, nxt

        _, outs = lax.scan(step, ids0, jnp.arange(maxlen))
        gen = jnp.moveaxis(outs, 0, 1)  # (B, maxlen)
        is_eos = gen == self.eos
        any_eos = jnp.any(is_eos, axis=1)
        lengths = jnp.where(any_eos, jnp.argmax(is_eos, axis=1), maxlen)
        return gen, lengths


@tables.register("model_classes", "LLMASR3")
class LLMASR3(LLMASR2):
    """reference llm_asr/model.py:830 ``LLMASR3(LLMASR2)`` — identical
    wiring except the torch audio encoder consumes (B, T, F) directly
    instead of channels-first (B, F, T) (``encode`` drops the permute,
    :841 vs :567).  Our encoders are (B, T, F)-native, so the classes
    coincide; registered separately so reference LLMASR3 configs build."""


@tables.register("model_classes", "LLMASR4")
class LLMASR4(LLMASR2):
    """reference llm_asr/model.py:848 ``LLMASR4`` — MULTI-TURN chat: a
    conversation holds several audio spans (fbank_beg/fake_token_len are
    (B, n_turns); the speech batch is the flattened span list in
    (batch, turn) order, :1010 ``speech_idx`` walk).  The splice helper is
    turn-generic, so this class only pins the calling convention:
    ``fake_token_len`` is REQUIRED (no fbank_mask form)."""

    def __call__(self, speech, speech_lengths, input_ids, attention_mask,
                 labels_ids, fbank_beg, fake_token_len=None,
                 deterministic: bool = False):
        if fake_token_len is None:
            raise ValueError("LLMASR4 requires per-turn fake_token_len")
        return super().__call__(
            speech, speech_lengths, input_ids, attention_mask, labels_ids,
            fbank_beg, fake_token_len=fake_token_len,
            deterministic=deterministic)


@tables.register("model_classes", "LLMASRNAR")
class LLMASRNAR(LLMASR):
    """Non-autoregressive audio LLM (reference funasr/models/llm_asr_nar/
    model.py:26 ``LLMASRNAR``): encoder -> CIF predictor emits ONE acoustic
    embedding per output token (``target_label_length`` scaling at train
    time, model.py:236) -> Linear adaptor (llm_asr_nar/adaptor.py:8) -> the
    embeddings are spliced into the LLM input at the audio-token positions
    (model.py:190-199) -> a single LLM forward; CE loss / per-position
    argmax decode — no generation loop.

    TPU form: the CIF token grid is the padded ``U`` axis, so the whole
    model (encoder, interval-overlap CIF, LLM stack) is one static-shape
    jitted program; NAR decode is a single forward + argmax, the fastest
    possible decode on the MXU.  Position ``j``'s logits predict token ``j``
    under a causal mask (the acoustic embedding for a token is visible to
    its own query, exactly the Paraformer NAR contract).
    """

    predictor_conf: Optional[Dict] = None

    def setup(self):
        super().setup()
        from funasr_tpu.models.paraformer.predictor import CifPredictorV2

        enc_out = dict(self.encoder_conf or {}).get("output_size", 256)
        pred_conf = dict(self.predictor_conf or {})
        pred_conf.setdefault("idim", enc_out)
        self.predictor = CifPredictorV2(
            dtype=self.dtype, param_dtype=self.param_dtype,
            name="predictor", **pred_conf)
        # CIF embeds are already token-synchronous: the reference "Linear"
        # adaptor with downsample_rate 1 (llm_asr_nar/adaptor.py:8), not the
        # k=5 frame-stacking projector of the AR model
        ad_conf = dict(self.adaptor_conf or {})
        ad_conf.setdefault("k", 1)
        ad_conf.setdefault("llm_dim", self.llm_dim)
        self.adaptor_nar = Adaptor(dtype=self.dtype,
                                   param_dtype=self.param_dtype,
                                   name="adaptor_nar", **ad_conf)

    def _token_embeds(self, speech, speech_lengths, max_tokens,
                      target_length, deterministic):
        if self.use_encoder:
            enc, enc_lens = self.encoder(speech, speech_lengths,
                                         deterministic)
        else:
            enc, enc_lens = speech, speech_lengths
        pred = self.predictor(enc, enc_lens, max_tokens,
                              target_length=target_length,
                              deterministic=deterministic)
        audio, _ = self.adaptor_nar(pred.acoustic_embeds,
                                    jnp.round(pred.token_num).astype(jnp.int32))
        return audio, pred

    def _nar_mask(self, n_tokens, U):
        pos = jnp.arange(U)
        key_valid = pos[None, :] < n_tokens[:, None]  # (B, U)
        causal = pos[None, :] <= pos[:, None]  # (U, U) query x key
        m = key_valid[:, None, :] & causal[None]
        return m[:, None, :, :].astype(jnp.float32)

    def __call__(self, speech, speech_lengths, text, text_lengths,
                 deterministic: bool = False):
        """One-pass CE: logits at CIF token position j predict text[j]."""
        U = text.shape[1]
        audio, pred = self._token_embeds(
            speech, speech_lengths, U,
            text_lengths.astype(jnp.float32), deterministic)
        mask = self._nar_mask(text_lengths, U)
        logits = self._llm(audio, mask, deterministic)
        pos = jnp.arange(U)[None, :]
        tgt_valid = pos < text_lengths[:, None]
        tgt = jnp.where(tgt_valid, text, 0)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        nll = -jnp.take_along_axis(logp, tgt[..., None], -1)[..., 0]
        nll = jnp.where(tgt_valid, nll, 0.0)
        loss = jnp.sum(nll) / jnp.maximum(jnp.sum(tgt_valid), 1)
        acc = jnp.sum(
            jnp.where(tgt_valid, (jnp.argmax(logits, -1) == tgt), False)
        ) / jnp.maximum(jnp.sum(tgt_valid), 1)
        return loss, {"loss": loss, "acc": acc}

    def nar_decode(self, speech, speech_lengths, max_tokens: int = 64):
        """Single-forward NAR decode -> (tokens (B, U), lengths (B,))."""
        audio, pred = self._token_embeds(speech, speech_lengths, max_tokens,
                                         None, True)
        n = jnp.clip(jnp.round(pred.token_num).astype(jnp.int32),
                     0, max_tokens)
        mask = self._nar_mask(n, max_tokens)
        logits = self._llm(audio, mask, True)
        return jnp.argmax(logits, -1).astype(jnp.int32), n

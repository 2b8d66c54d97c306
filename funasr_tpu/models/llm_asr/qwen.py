"""Qwen2-architecture causal LM half for LLM-ASR / Qwen-Audio.

The reference builds its LLM-ASR stacks around published causal-LM
checkpoints (funasr/models/llm_asr/model.py:27 loads the LLM from hub
weights; funasr/models/qwen_audio/model.py wraps Qwen-Audio weights).
This module implements the Qwen2 decoder architecture exactly — RMSNorm,
rotary position embeddings (NeoX half-split), grouped-query attention
with q/k/v biases, SwiGLU MLP, optional tied lm_head — so converted HF
``Qwen2ForCausalLM`` weights reproduce the torch logits
(tests/test_qwen_convert.py pins parity), closing the last model family
without a weight-loading path.

Parameter names mirror the HF module tree (embed_tokens / layers.N.
input_layernorm / self_attn.{q,k,v,o}_proj / post_attention_layernorm /
mlp.{gate,up,down}_proj / norm / lm_head) with the layer axis stacked
for ``nn.scan``, so the converter (convert.py ``qwen2_from_torch``) is a
transpose-only mapping.

TPU notes: the whole stack runs under one ``nn.scan`` (single compiled
layer body), attention softmax fp32, matmuls in the module dtype (bf16
for serving).  The prefix-LM audio mask from ``LLMASR`` drops straight
in — rotary positions are absolute indices, audio frames occupy
positions 0..Ta-1 like Qwen-Audio's audio tokens.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from funasr_tpu.models.sanm import masked_softmax

Dtype = Any


class RMSNorm(nn.Module):
    """Qwen2RMSNorm: x * rsqrt(mean(x^2) + eps) * weight, fp32 stats."""

    eps: float = 1e-6
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        w = self.param("weight", nn.initializers.ones, (d,),
                       self.param_dtype)
        xf = x.astype(jnp.float32)
        xf = xf * jax.lax.rsqrt(
            jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + self.eps)
        return (xf * w.astype(jnp.float32)).astype(self.dtype)


def rope_cos_sin(positions, head_dim: int, theta: float):
    """(L,) int positions -> cos/sin (L, head_dim) in the HF/NeoX layout
    (frequencies over the first half, duplicated to the second)."""
    inv = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32)
                           / head_dim))
    ang = positions.astype(jnp.float32)[:, None] * inv[None, :]  # (L, d/2)
    ang = jnp.concatenate([ang, ang], axis=-1)                   # (L, d)
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope(x, cos, sin):
    """x (B, L, H, d); cos/sin (L, d).  HF rotate_half convention."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rot = jnp.concatenate([-x2, x1], axis=-1)
    c = cos[None, :, None, :].astype(x.dtype)
    s = sin[None, :, None, :].astype(x.dtype)
    return x * c + rot * s


class _QwenLayer(nn.Module):
    """One Qwen2DecoderLayer (HF modeling_qwen2.py) as an nn.scan body."""

    dim: int
    n_head: int
    n_kv_head: int
    ffn: int
    rope_theta: float = 1000000.0
    rms_eps: float = 1e-6
    attn_bias: bool = True   # Qwen2: q/k/v biased, o unbiased
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, inputs, deterministic: bool = True):
        mask, cos, sin = inputs
        B, L, _ = x.shape
        dk = self.dim // self.n_head
        kvdim = self.n_kv_head * dk
        dense = lambda f, name, bias: nn.Dense(
            f, name=name, use_bias=bias, dtype=self.dtype,
            param_dtype=self.param_dtype)

        res = x
        h = RMSNorm(self.rms_eps, self.dtype, self.param_dtype,
                    name="input_layernorm")(x)
        attn = h  # keep the pre-norm activations for q/k/v
        q = dense(self.dim, "q_proj", self.attn_bias)(attn)
        k = dense(kvdim, "k_proj", self.attn_bias)(attn)
        v = dense(kvdim, "v_proj", self.attn_bias)(attn)
        q = apply_rope(q.reshape(B, L, self.n_head, dk), cos, sin)
        k = apply_rope(k.reshape(B, L, self.n_kv_head, dk), cos, sin)
        v = v.reshape(B, L, self.n_kv_head, dk)
        rep = self.n_head // self.n_kv_head
        if rep > 1:  # GQA: repeat kv heads
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)
        scores = jnp.einsum("bthd,bshd->bhts", q * (dk ** -0.5), k)
        attn_w = masked_softmax(scores, mask)
        ctx = jnp.einsum("bhts,bshd->bthd", attn_w.astype(v.dtype), v)
        o = dense(self.dim, "o_proj", False)(ctx.reshape(B, L, self.dim))
        x = res + o

        res = x
        h = RMSNorm(self.rms_eps, self.dtype, self.param_dtype,
                    name="post_attention_layernorm")(x)
        gate = dense(self.ffn, "gate_proj", False)(h)
        up = dense(self.ffn, "up_proj", False)(h)
        down = dense(self.dim, "down_proj", False)(nn.silu(gate) * up)
        return res + down, None


class Qwen2LM(nn.Module):
    """Qwen2 decoder stack over input EMBEDDINGS (audio prefix + token
    embeds), returning lm_head logits.  ``embed`` exposes the token
    embedding table for the caller's prompt construction."""

    vocab_size: int
    dim: int = 512
    layers: int = 4
    heads: int = 8
    kv_heads: Optional[int] = None
    ffn: Optional[int] = None
    rope_theta: float = 1000000.0
    rms_eps: float = 1e-6
    tie_word_embeddings: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        kv = self.kv_heads or self.heads
        ffn = self.ffn or int(2.6875 * self.dim)
        self.embed_tokens = nn.Embed(
            self.vocab_size, self.dim, name="embed_tokens",
            dtype=self.dtype, param_dtype=self.param_dtype)
        Stack = nn.scan(
            _QwenLayer,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            length=self.layers,
            in_axes=(nn.broadcast, nn.broadcast),
        )
        self.layers_stack = Stack(
            self.dim, self.heads, kv, ffn, self.rope_theta, self.rms_eps,
            True, self.dtype, self.param_dtype, name="layers")
        self.norm = RMSNorm(self.rms_eps, self.dtype, self.param_dtype,
                            name="norm")
        if not self.tie_word_embeddings:
            self.lm_head = nn.Dense(
                self.vocab_size, use_bias=False, name="lm_head",
                dtype=self.dtype, param_dtype=self.param_dtype)

    def embed(self, ids):
        return self.embed_tokens(ids)

    def __call__(self, embeds, mask, positions=None,
                 deterministic: bool = True):
        """embeds (B, L, dim); mask (B, 1, L, L) nonzero=attend;
        positions (L,) absolute rotary positions (default arange)."""
        L = embeds.shape[1]
        if positions is None:
            positions = jnp.arange(L)
        dk = self.dim // self.heads
        cos, sin = rope_cos_sin(positions, dk, self.rope_theta)
        x, _ = self.layers_stack(embeds, (mask, cos, sin), deterministic)
        x = self.norm(x)
        if self.tie_word_embeddings:
            table = self.embed_tokens.embedding
            return x @ table.T.astype(x.dtype)
        return self.lm_head(x)

    def logits_from_ids(self, ids, mask=None, deterministic: bool = True):
        """Token-id convenience entry (the HF forward): causal mask."""
        B, L = ids.shape
        if mask is None:
            causal = jnp.tril(jnp.ones((L, L), jnp.float32))
            mask = causal[None, None, :, :]
        return self(self.embed_tokens(ids), mask,
                    deterministic=deterministic)

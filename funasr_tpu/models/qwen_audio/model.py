"""Qwen-Audio style audio-text LLM (reference funasr/models/qwen_audio/ —
a Whisper-family audio encoder feeding a causal LLM through an adaptor).

Composition here: the flax Whisper encoder (funasr_tpu/models/whisper)
produces audio states; the LLM-ASR prefix-LM stack (encoder-skipped)
consumes them through its frame-stacking adaptor.  With local Qwen-Audio
weights the LLM block's parameters are replaced by the converted
checkpoint; randomly initialized it exercises the full graph (training,
greedy generation, sharding).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from funasr_tpu.models.llm_asr.model import LLMASR
from funasr_tpu.models.whisper.model import WhisperWrap
from funasr_tpu.registry import tables


@tables.register("model_classes", "QwenAudio")
class QwenAudio:
    def __init__(self, vocab_size: int, whisper_size: str = "tiny",
                 whisper_overrides: Optional[Dict] = None,
                 adaptor_conf: Optional[Dict] = None,
                 llm_conf: Optional[Dict] = None,
                 dtype=jnp.float32, **kwargs):
        self.audio = WhisperWrap(size=whisper_size, dtype=dtype,
                                 config_overrides=whisper_overrides or {})
        d_audio = self.audio.config.d_model
        self.lm = LLMASR(vocab_size=vocab_size, input_size=d_audio,
                         use_encoder=False,
                         adaptor_conf=adaptor_conf, llm_conf=llm_conf,
                         dtype=dtype)
        self.lm_params = None

        @jax.jit
        def _decode(params, enc, enc_lens):
            return self.lm.apply(params, enc, enc_lens, maxlen=64,
                                 method=self.lm.greedy_decode)

        self._decode = _decode

    def init_params(self, rng, n_frames: int = 50):
        d = self.audio.config.d_model
        self.lm_params = self.lm.init(
            {"params": rng, "dropout": rng},
            jnp.zeros((1, n_frames, d)), jnp.array([n_frames], jnp.int32),
            jnp.zeros((1, 4), jnp.int32), jnp.array([4], jnp.int32),
            deterministic=True)
        return self.lm_params

    def encode_audio(self, input_features: jnp.ndarray):
        """(B, n_mels, T_mel) log-mel -> (B, T, d) encoder states."""
        return self.audio.encode(input_features)

    def generate(self, input_features: jnp.ndarray):
        enc = self.encode_audio(input_features)
        lens = jnp.full((enc.shape[0],), enc.shape[1], jnp.int32)
        return self._decode(self.lm_params, enc, lens)

    def loss(self, params, input_features, text, text_lengths):
        enc = self.encode_audio(input_features)
        lens = jnp.full((enc.shape[0],), enc.shape[1], jnp.int32)
        l, stats = self.lm.apply(params, enc, lens, text, text_lengths,
                                 deterministic=True)
        return l, stats

"""Whisper model family (reference funasr/models/whisper/model.py:20 wraps
OpenAI checkpoints by size).

Here the flax implementation from ``transformers`` provides the graph; this
wrapper adapts it to the funasr_tpu model contract (log-mel input, greedy
device decode) and to the (data, model) mesh — the encoder's
attention/FFN kernels shard over the ``model`` axis through the generic
param-sharding rules (the q/k/v/out_proj and fc1/fc2 HF names match the
regex table in funasr_tpu/parallel/mesh.py directly).

Weights: load a HF flax checkpoint directory via ``from_pretrained`` when
one is available locally; otherwise random init from the size config
(accuracy work needs real weights; the graph/sharding/TPU path is what this
wrapper owns).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from funasr_tpu.registry import tables

def _size(d_model, layers, heads, **extra):
    # FFN width is 4*d_model in every released Whisper; WhisperConfig's
    # default (1536) only matches tiny, so spell it out per size
    return dict(d_model=d_model, encoder_layers=layers,
                encoder_attention_heads=heads, decoder_layers=layers,
                decoder_attention_heads=heads,
                encoder_ffn_dim=4 * d_model, decoder_ffn_dim=4 * d_model,
                **extra)


SIZES = {
    "tiny": _size(384, 4, 6),
    "base": _size(512, 6, 8),
    "small": _size(768, 12, 12),
    "medium": _size(1024, 24, 16),
    "large-v3": _size(1280, 32, 20, num_mel_bins=128, vocab_size=51866),
}


@tables.register("model_classes", "Whisper")
@tables.register("model_classes", "WhisperWrap")
class WhisperWrap:
    def __init__(self, size: str = "tiny", model_path: Optional[str] = None,
                 dtype=jnp.bfloat16, **kwargs):
        from transformers import WhisperConfig
        from transformers.models.whisper.modeling_flax_whisper import (
            FlaxWhisperForConditionalGeneration,
        )

        if model_path:
            self.model = FlaxWhisperForConditionalGeneration.from_pretrained(
                model_path, dtype=dtype)
            self.params = self.model.params
            self.config = self.model.config
        else:
            conf = dict(SIZES.get(size, SIZES["tiny"]))
            conf.update(kwargs.get("config_overrides", {}))
            self.config = WhisperConfig(**conf)
            self.model = FlaxWhisperForConditionalGeneration(
                self.config, dtype=dtype, _do_init=True)
            self.params = self.model.params
        self.size = size

    def encode(self, input_features: jnp.ndarray):
        """(B, n_mels, 3000) log-mel -> encoder states."""
        return self.model.encode(input_features=input_features,
                                 params=self.params).last_hidden_state

    def greedy_decode(self, input_features: jnp.ndarray, max_tokens: int = 64,
                      forced_tokens: Optional[list] = None):
        """Device greedy decode -> (B, max_tokens) token ids."""
        enc = self.model.encode(input_features=input_features,
                                params=self.params)
        B = input_features.shape[0]
        sot = self.config.decoder_start_token_id
        eos = self.config.eos_token_id
        start = [sot] + list(forced_tokens or [])
        del eos  # greedy loop runs to max_tokens; caller trims at eos

        tokens = jnp.tile(jnp.asarray(start, jnp.int32)[None], (B, 1))
        for _ in range(max_tokens):
            out = self.model.decode(decoder_input_ids=tokens,
                                    encoder_outputs=enc, params=self.params)
            nxt = jnp.argmax(out.logits[:, -1, :], axis=-1).astype(jnp.int32)
            tokens = jnp.concatenate([tokens, nxt[:, None]], axis=1)
        return tokens[:, len(start):]

    def detect_language(self, input_features: jnp.ndarray,
                        language_token_ids):
        """Whisper-style LID: first-step decoder logits restricted to the
        language tokens -> (B, n_langs) probabilities (reference
        funasr/models/whisper_lid/model.py:22,458 adds LID heads; the
        vanilla whisper LID reads the <|lang|> position posteriors)."""
        enc = self.model.encode(input_features=input_features,
                                params=self.params)
        B = input_features.shape[0]
        sot = jnp.full((B, 1), self.config.decoder_start_token_id, jnp.int32)
        out = self.model.decode(decoder_input_ids=sot, encoder_outputs=enc,
                                params=self.params)
        lang_ids = jnp.asarray(list(language_token_ids), jnp.int32)
        logits = out.logits[:, 0, :]
        lang_logits = logits[:, lang_ids]
        return jax.nn.softmax(lang_logits.astype(jnp.float32), axis=-1)


@tables.register("model_classes", "WhisperLID")
class WhisperLID(WhisperWrap):
    """Whisper with language identification as a first-class output
    (reference funasr/models/whisper_lid).  ``transcribe_with_lid`` returns
    (tokens, lang_probs) in one pass."""

    def __init__(self, *args, language_token_ids=None, **kwargs):
        super().__init__(*args, **kwargs)
        self.language_token_ids = list(language_token_ids or [])

    def transcribe_with_lid(self, input_features: jnp.ndarray,
                            max_tokens: int = 64):
        if not self.language_token_ids:
            raise ValueError(
                "WhisperLID needs language_token_ids (the tokenizer ids of "
                "the <|xx|> language tokens) to detect languages")
        probs = self.detect_language(input_features,
                                     self.language_token_ids)
        best = np.asarray(jnp.argmax(probs, axis=-1))
        lang_ids = np.asarray(self.language_token_ids)
        # decode each utterance with ITS detected language token (grouped
        # by language so each group is one fixed-shape decode)
        B = input_features.shape[0]
        out_tokens = None
        for lang in np.unique(best):
            idx = np.nonzero(best == lang)[0]
            toks = self.greedy_decode(
                input_features[jnp.asarray(idx)], max_tokens=max_tokens,
                forced_tokens=[int(lang_ids[lang])])
            toks = np.asarray(toks)
            if out_tokens is None:
                out_tokens = np.zeros((B,) + toks.shape[1:], toks.dtype)
            out_tokens[idx] = toks
        return jnp.asarray(out_tokens), probs

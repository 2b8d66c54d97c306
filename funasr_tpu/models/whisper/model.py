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

        if model_path and str(model_path).endswith(".pt"):
            # openai-whisper checkpoint layout ({"dims", "model_state_dict"})
            # — what the reference loads via whisper.load_model and what
            # ModelScope Whisper deliveries ship (convert.py does the
            # renaming + torch->flax transposes)
            from funasr_tpu.convert import whisper_from_openai_pt

            self.config, self.params = whisper_from_openai_pt(
                model_path, dtype=dtype)
            self.model = FlaxWhisperForConditionalGeneration(
                self.config, dtype=dtype, _do_init=False)
        elif model_path:
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
        """Device greedy decode -> (B, max_tokens) token ids.

        One jitted program: the decoder runs with a KV cache under
        ``lax.scan`` (fixed shapes, O(L) work) instead of re-running the
        full decoder over the growing prefix each step."""
        import functools

        sot = self.config.decoder_start_token_id
        start = tuple([sot] + list(forced_tokens or []))
        key = (max_tokens, start, input_features.shape)
        if getattr(self, "_greedy_key", None) != key:
            n0 = len(start)
            total = n0 + max_tokens

            @jax.jit
            def run(params, feats):
                enc = self.model.encode(input_features=feats, params=params)
                B = feats.shape[0]
                cache = self.model.init_cache(B, total, enc)
                forced = jnp.tile(jnp.asarray(start, jnp.int32)[None],
                                  (B, 1))  # (B, n0)

                def body(carry, i):
                    tok, cache = carry  # tok (B,) current input token
                    o = self.model.decode(
                        decoder_input_ids=tok[:, None], encoder_outputs=enc,
                        params=params, past_key_values=cache,
                        decoder_position_ids=jnp.full((B, 1), i, jnp.int32))
                    pred = jnp.argmax(o.logits[:, -1, :],
                                      -1).astype(jnp.int32)
                    # inside the forced prefix the next input is the forced
                    # token; afterwards it is the greedy prediction
                    in_prefix = i + 1 < n0
                    nxt = jnp.where(in_prefix,
                                    forced[:, jnp.minimum(i + 1, n0 - 1)],
                                    pred)
                    return (nxt, o.past_key_values), pred

                steps = n0 + max_tokens - 1
                (_, _), preds = jax.lax.scan(
                    body, (forced[:, 0], cache), jnp.arange(steps))
                preds = jnp.moveaxis(preds, 0, 1)  # (B, steps)
                return preds[:, n0 - 1:]  # the max_tokens continuations

            self._greedy_key = key
            self._greedy_fn = run
        return self._greedy_fn(self.params, input_features)

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

"""Streaming (VAD-aware realtime) CT-Transformer punctuation (reference
funasr/models/ct_transformer_streaming/model.py:28).

Same network as the offline CT-Transformer, but inference is incremental:
each call receives newly recognized words plus a cache of not-yet-committed
words, and attention uses a *controllable time-delay* mask
(``vad_mask``): words before the VAD point (the cached prefix) cannot
attend to words that arrived after it, so their committed punctuation is
stable across calls, while new words see full context.

After prediction, everything up to the last sentence end (。/？) is
committed and emitted; the tail stays in the cache for the next call.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from funasr_tpu.models.ct_transformer.model import (
    CTTransformer,
    CTTransformerModel,
    split_words,
)
from funasr_tpu.registry import tables


def vad_mask(size: int, vad_pos: int, dtype=np.float32) -> np.ndarray:
    """(size, size) attention mask: rows < vad_pos-? may not see columns >=
    vad_pos (reference ct_transformer_streaming/utils.py vad_mask — ones
    everywhere except the upper-right block above the VAD point)."""
    m = np.ones((size, size), dtype)
    if 0 < vad_pos < size:
        m[: vad_pos - 1, vad_pos:] = 0.0
    return m


@tables.register("model_classes", "CTTransformerStreaming")
class CTTransformerStreamingModel(CTTransformerModel):
    """Realtime punctuation with cross-call caches.

    ``punctuate_streaming(text, cache)`` consumes newly decoded words,
    returns the words committed this call (with punctuation) and mutates
    ``cache`` in place.  Pass ``is_final=True`` on the last call to flush.
    """

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._jit_forward_masked = jax.jit(
            lambda p, t, l, m: self.module.apply(p, t, l, attn_mask=m)
        )

    def _punc_ids_masked(self, token_ids: np.ndarray,
                         vad_pos: int) -> np.ndarray:
        n = len(token_ids)
        pad = max(8, 8 * ((n + 7) // 8))
        text = np.zeros((1, pad), np.int32)
        text[0, :n] = token_ids
        am = np.ones((1, pad, pad), np.float32)
        am[0, :n, :n] = vad_mask(n, vad_pos)
        logits = self._jit_forward_masked(
            self.params, jnp.asarray(text), jnp.asarray([n]),
            jnp.asarray(am),
        )
        return np.asarray(jnp.argmax(logits[0, :n], -1))

    def punctuate_streaming(self, text: str, cache: Optional[Dict] = None,
                            is_final: bool = False) -> Dict[str, Any]:
        cache = cache if cache is not None else {}
        prev_words: List[str] = cache.get("words", [])
        prev_ids: List[int] = cache.get("ids", [])

        new_words = split_words(text)
        new_ids = self.tokens2ids(new_words)
        words = prev_words + new_words
        ids = np.asarray(prev_ids + new_ids, np.int32)
        if len(words) == 0:
            return {"text": "", "punc_array": np.zeros((0,), np.int64),
                    "cache": cache}

        puncs = self._punc_ids_masked(ids, vad_pos=len(prev_words))

        if is_final:
            commit = len(words)
        else:
            commit = 0
            for i in range(len(puncs) - 1, -1, -1):
                if self.punc_list[puncs[i]] in ("。", "？", ".", "?"):
                    commit = i + 1
                    break
        out_words = words[:commit]
        out_puncs = np.array(puncs[:commit])  # writable copy
        cache["words"] = words[commit:]
        cache["ids"] = list(ids[commit:])

        out_text = self._assemble(out_words, out_puncs) if out_words else ""
        if is_final and out_text and out_text[-1] not in ("。", "？", ".", "?"):
            ascii_last = len(out_text[-1].encode()) == 1
            if out_text[-1] in ("，", "、"):
                out_text = out_text[:-1] + "。"
            elif out_text[-1] == ",":
                out_text = out_text[:-1] + "."
            else:
                out_text += "." if ascii_last else "。"
            if len(out_puncs):
                out_puncs[-1] = self.sentence_end_id
        return {"text": out_text,
                "punc_array": np.asarray(out_puncs, np.int64),
                "cache": cache}

    def tokens2ids(self, words: List[str]) -> List[int]:
        tok = getattr(self, "_tokenizer", None)
        if tok is None:
            raise RuntimeError("attach a tokenizer via set_tokenizer() first")
        return tok.tokens2ids(words)

    def set_tokenizer(self, tokenizer):
        self._tokenizer = tokenizer
        return self


__all__ = ["CTTransformerStreamingModel", "vad_mask", "CTTransformer"]

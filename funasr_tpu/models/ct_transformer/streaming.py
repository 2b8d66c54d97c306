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
        """Mini-sentence windowing like the reference (model.py:78-140):
        new words are consumed in ``split_size``-word windows, each run as
        [carried tail + window]; everything up to the window's last 。/？
        commits; a window that exceeds ``cache_pop_trigger_limit`` words
        with no sentence end force-breaks at its last comma (promoted to
        。), so the carry — and the per-call forward length — stay bounded.
        """
        cache = cache if cache is not None else {}
        prev_words: List[str] = cache.get("words", [])
        prev_ids: List[int] = list(cache.get("ids", []))

        new_words = split_words(text)
        new_ids = self.tokens2ids(new_words)
        split_size = 20
        cache_pop_trigger_limit = 200
        windows = [
            (new_words[i: i + split_size], new_ids[i: i + split_size])
            for i in range(0, len(new_words), split_size)
        ]
        if not windows:
            if not (is_final and prev_words):
                return {"text": "", "punc_array": np.zeros((0,), np.int64),
                        "cache": cache}
            windows = [([], [])]  # final flush of the carried tail

        out_words: List[str] = []
        out_puncs: List[int] = []
        sentence_ends = ("。", "？", ".", "?")
        for wi, (mw, mi) in enumerate(windows):
            words = prev_words + mw
            ids = prev_ids + list(mi)
            if not words:
                continue
            puncs = np.array(self._punc_ids_masked(
                np.asarray(ids, np.int32), vad_pos=len(prev_words)))
            if is_final and wi == len(windows) - 1:
                commit = len(words)
            else:
                sentence_end, last_comma = -1, -1
                for i in range(len(puncs) - 2, 1, -1):
                    p = self.punc_list[puncs[i]]
                    if p in sentence_ends:
                        sentence_end = i
                        break
                    if last_comma < 0 and p in ("，", ","):
                        last_comma = i
                if (sentence_end < 0
                        and len(words) > cache_pop_trigger_limit
                        and last_comma >= 0):
                    # too long with no sentence end: break at the comma
                    sentence_end = last_comma
                    puncs[sentence_end] = self.sentence_end_id
                commit = sentence_end + 1
            out_words += words[:commit]
            out_puncs += puncs[:commit].tolist()
            prev_words = words[commit:]
            prev_ids = ids[commit:]

        cache["words"] = prev_words
        cache["ids"] = prev_ids
        out_puncs = np.asarray(out_puncs, np.int64)

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

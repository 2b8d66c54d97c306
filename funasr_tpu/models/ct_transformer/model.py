"""CT-Transformer punctuation restoration (reference
funasr/models/ct_transformer/model.py:34).

Network: token embedding -> SANM encoder -> per-token punctuation softmax
(classes like ``["<unk>", "_", "，", "。", "？", "、"]``).  Inference slides a
mini-sentence window of ``split_size`` words, carrying the tail after the
last sentence end (。/？) as cache into the next window and force-breaking at
the last comma once the buffer exceeds 200 tokens (model.py:247-320).

The window loop is host logic over device logit calls; each call is a
fixed-shape jitted forward (token grid padded to the window bound).
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from funasr_tpu.models.sanm import SANMEncoder
from funasr_tpu.registry import tables

Dtype = Any


#  one CJK char | a run of non-CJK non-space chars — C-level equivalent of
#  the per-char loop (long-audio punc host hot spot, BENCH_PIPELINE r4)
#  (single-char class starts at U+3001: U+3000 is whitespace and was a
#  split()-separator in the loop form, never a token)
_SPLIT_RE = re.compile("[一-鿿、-〿]|[^一-鿿　-〿\\s]+")


def split_words(text: str) -> List[str]:
    """CJK chars as single tokens, ascii words kept whole
    (reference funasr/models/ct_transformer/utils.py split_words)."""
    return _SPLIT_RE.findall(text)


def split_to_mini_sentence(words: List, word_limit: int = 20) -> List[List]:
    return [words[i : i + word_limit] for i in range(0, len(words), word_limit)]


class CTTransformer(nn.Module):
    """The trainable network: embed -> SANM encoder -> punc projection."""

    vocab_size: int
    punc_size: int = 6
    embed_unit: int = 256
    att_unit: int = 256
    encoder_conf: Optional[Dict] = None
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        conf = dict(self.encoder_conf or {})
        conf.setdefault("output_size", self.att_unit)
        conf.setdefault("attention_heads", 8)
        conf.setdefault("linear_units", 1024)
        conf.setdefault("num_blocks", 4)
        # punc windows are small + dispatch-bound: unroll the 4-layer
        # stack so XLA fuses across layers (same r4 finding as the beam)
        conf.setdefault("unroll_layers", True)
        conf.setdefault("kernel_size", 11)
        input_layer = conf.pop("input_layer", "pe")
        sanm_shift = conf.pop("sanm_shfit", 0)
        self.embed = nn.Embed(self.vocab_size, self.embed_unit, name="embed",
                              dtype=self.dtype, param_dtype=self.param_dtype)
        self.encoder = SANMEncoder(
            input_size=self.embed_unit, input_layer=input_layer,
            sanm_shift=sanm_shift, dtype=self.dtype,
            param_dtype=self.param_dtype, name="encoder", **conf,
        )
        self.decoder = nn.Dense(self.punc_size, name="decoder",
                                dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, text: jnp.ndarray, text_lengths: jnp.ndarray,
                 deterministic: bool = True, attn_mask=None):
        x = self.embed(text)
        h, _ = self.encoder(x, text_lengths, deterministic,
                            attn_mask=attn_mask)
        return self.decoder(h)

    def loss(self, text, punc, text_lengths, punc_weight=None,
             deterministic: bool = False, ignore_id: int = -1):
        """Weighted token-level cross entropy (model.py:208-227)."""
        logits = self(text, text_lengths, deterministic)
        valid = (jnp.arange(text.shape[1])[None] < text_lengths[:, None])
        tgt = jnp.where(punc == ignore_id, 0, punc)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        nll = -jnp.take_along_axis(logp, tgt[..., None], -1)[..., 0]
        if punc_weight is not None:
            w = jnp.asarray(punc_weight)[tgt]
            nll = nll * w
        nll = jnp.where(valid & (punc != ignore_id), nll, 0.0)
        ntokens = jnp.maximum(jnp.sum(text_lengths), 1)
        return jnp.sum(nll) / ntokens


@tables.register("model_classes", "CTTransformer")
class CTTransformerModel:
    """User-facing punctuation model with the mini-sentence window loop."""

    def __init__(
        self,
        vocab_size: int,
        punc_list: List[str] = ("<unk>", "_", "，", "。", "？", "、"),
        embed_unit: int = 256,
        att_unit: int = 256,
        encoder: str = "SANMEncoder",
        encoder_conf: Optional[Dict] = None,
        sentence_end_id: int = 3,
        params=None,
        dtype: str = "float32",
        **kwargs,
    ):
        self.module = CTTransformer(
            vocab_size=vocab_size, punc_size=len(punc_list),
            embed_unit=embed_unit, att_unit=att_unit,
            encoder_conf=encoder_conf,
            dtype=jnp.dtype(dtype),  # bf16 serving compute (params fp32)
        )
        self.punc_list = list(punc_list)
        self.sentence_end_id = sentence_end_id
        self._end_ids = np.asarray(
            [i for i, p in enumerate(self.punc_list) if p in ("。", "？")])
        self._comma_ids = np.asarray(
            [i for i, p in enumerate(self.punc_list) if p == "，"])
        self.params = params
        def _fwd(p, t, l):
            # punc matmuls are tiny (att_unit 256, <=208-token windows):
            # dynamic-int8 row-quant overhead exceeds any MXU gain, so
            # the punc program pins the fp path regardless of the
            # process-wide serving quant flag (measured 0.22 ms vs
            # ~0 ms per window on TPU, BENCH_PIPELINE r03)
            from funasr_tpu.ops import quant

            with quant.quantized(False):
                return self.module.apply(p, t, l)

        self._jit_forward = jax.jit(_fwd)

    def init_params(self, rng):
        t = jnp.zeros((1, 8), jnp.int32)
        self.params = self.module.init(rng, t, jnp.array([8]))
        return self.params

    def _punc_ids(self, token_ids: np.ndarray) -> np.ndarray:
        pad = 8 * ((len(token_ids) + 7) // 8)  # quantized window shapes
        text = np.zeros((1, max(pad, 8)), np.int32)
        text[0, : len(token_ids)] = token_ids
        logits = self._jit_forward(
            self.params, jnp.asarray(text), jnp.asarray([len(token_ids)])
        )
        return np.asarray(jnp.argmax(logits[0, : len(token_ids)], -1))

    def _punc_ids_batch(self, id_lists: List[np.ndarray]) -> List[np.ndarray]:
        """Score N windows in ONE device call (windows padded to a
        quantized (B, W) grid to bound recompiles)."""
        n = len(id_lists)
        if n == 1:
            return [self._punc_ids(id_lists[0])]
        B = 1 << (n - 1).bit_length()  # pow2 batch buckets
        W = max(8, 8 * ((max(len(x) for x in id_lists) + 7) // 8))
        text = np.zeros((B, W), np.int32)
        lens = np.zeros((B,), np.int32)
        for i, ids in enumerate(id_lists):
            text[i, : len(ids)] = ids
            lens[i] = len(ids)
        logits = self._jit_forward(self.params, jnp.asarray(text),
                                  jnp.asarray(lens))
        am = np.asarray(jnp.argmax(logits, -1))
        return [am[i, : len(ids)] for i, ids in enumerate(id_lists)]

    def inference(self, text: str, tokenizer, split_size: int = 20,
                  cache_pop_trigger_limit: int = 200) -> Dict[str, Any]:
        """Returns {"text": punctuated text, "punc_array": per-token ids}."""
        return self.inference_batch([text], tokenizer, split_size,
                                    cache_pop_trigger_limit)[0]

    def inference_batch(self, texts: List[str], tokenizer,
                        split_size: int = 20,
                        cache_pop_trigger_limit: int = 200
                        ) -> List[Dict[str, Any]]:
        """Punctuate N texts with the SAME per-text semantics as the
        sequential reference loop, but window wi of every text scored in
        one batched device call per round — the long-audio pipeline's
        per-VAD-segment punc runs in ~max_windows device calls instead of
        sum(windows) (the r3 host bottleneck, BENCH_PIPELINE punc_host)."""
        states = []
        for text in texts:
            tokens = split_words(text)
            st = {"mini": split_to_mini_sentence(tokens, split_size)
                  if tokens else [],
                  "mini_ids": split_to_mini_sentence(
                      tokenizer.tokens2ids(tokens), split_size)
                  if tokens else [],
                  "cache_sent": [], "cache_ids": [],
                  "out_text": "", "punc_array": [], "wi": 0}
            states.append(st)

        while True:
            active = [st for st in states if st["wi"] < len(st["mini"])]
            if not active:
                break
            ids_list = [np.asarray(st["cache_ids"]
                                   + st["mini_ids"][st["wi"]], np.int32)
                        for st in active]
            puncs_list = self._punc_ids_batch(ids_list)
            end_ids = self._end_ids
            comma_ids = self._comma_ids
            for st, ids, puncs in zip(active, ids_list, puncs_list):
                wi = st["wi"]
                sent = st["cache_sent"] + st["mini"][wi]
                if wi < len(st["mini"]) - 1:
                    # carry the tail after the last sentence end as cache.
                    # (numpy max-index form of the reference's backward
                    # scan over positions [2, len-2]: the scan stopped at
                    # the FIRST 。/？ from the right, i.e. the max index,
                    # and last_comma — only consulted when no sentence end
                    # exists — is then simply the max comma index.)
                    sentence_end = -1
                    last_comma = -1
                    win = np.asarray(puncs[2:-1])
                    if win.size:
                        # tiny id sets: chained == beats np.isin's set
                        # machinery by ~15 us/window (r5 bench regression)
                        hit = np.zeros(win.shape, bool)
                        for e in end_ids:
                            hit |= win == e
                        idx = np.flatnonzero(hit)
                        if idx.size:
                            sentence_end = int(idx[-1]) + 2
                        else:
                            hit[:] = False
                            for e in comma_ids:
                                hit |= win == e
                            idx = np.flatnonzero(hit)
                            if idx.size:
                                last_comma = int(idx[-1]) + 2
                    if (sentence_end < 0
                            and len(sent) > cache_pop_trigger_limit
                            and last_comma >= 0):
                        sentence_end = last_comma
                        puncs[sentence_end] = self.sentence_end_id
                    st["cache_sent"] = sent[sentence_end + 1:]
                    st["cache_ids"] = list(ids[sentence_end + 1:])
                    sent = sent[: sentence_end + 1]
                    puncs = puncs[: sentence_end + 1]
                puncs_l = puncs.tolist() if hasattr(puncs, "tolist") \
                    else list(puncs)
                st["out_text"] += self._assemble(sent, puncs_l)
                st["punc_array"].extend(puncs_l)
                st["wi"] = wi + 1

        results = []
        for st in states:
            out_text, punc_array = st["out_text"], st["punc_array"]
            # final sentence-end normalization (model.py:357-389)
            if out_text:
                last = out_text[-1]
                if last in ("，", "、"):
                    out_text = out_text[:-1] + "。"
                    punc_array[-1] = self.sentence_end_id
                elif last == ",":
                    out_text = out_text[:-1] + "."
                    punc_array[-1] = self.sentence_end_id
                elif last not in ("。", "？", ".", "?"):
                    is_ascii = len(last.encode()) == 1
                    out_text += "." if is_ascii else "。"
                    if punc_array:
                        punc_array[-1] = self.sentence_end_id
            results.append({"text": out_text,
                            "punc_array": np.asarray(punc_array,
                                                     np.int64)})
        return results

    def _assemble(self, words: List[str], puncs) -> str:
        """Join words + predicted puncs with CJK/ascii spacing rules
        (model.py:326-353).  ``puncs`` should be a plain list (per-element
        numpy indexing costs ~100 ns x 2 per word — r5 host profile)."""
        if hasattr(puncs, "tolist"):
            puncs = puncs.tolist()
        parts: List[str] = []
        for i, w in enumerate(words):
            ascii_w = w[0] < "\x80"  # == len(w[0].encode()) == 1
            # reference model.py:330 capitalizes the window's FIRST ascii
            # word too, not only words after sentence-final punctuation
            if ascii_w and (i == 0
                            or self.punc_list[puncs[i - 1]] in ("。", "？")):
                w = w.capitalize()
            if ascii_w and (i == 0 or words[i - 1][0] < "\x80"):
                w = " " + w
            parts.append(w)
            p = self.punc_list[puncs[i]]
            if p != "_" and puncs[i] > 1:
                if ascii_w:
                    p = {"，": ",", "。": ".", "？": "?"}.get(p, p)
                parts.append(p)
        return "".join(parts)

"""N-gram language model: ARPA loader + shallow fusion / n-best rescoring
(the TPU-native replacement for the reference's WFST+ngram decode path,
runtime/onnxruntime/src/wfst-decoder.cpp over TLG.fst: instead of composing
a decoding graph, CTC/attention beam search runs on device and the n-gram
scores join as fusion/rescoring terms).

``NgramLM`` parses an ARPA file into backoff tables keyed by token-id
tuples.  APIs:

- ``logp(context, token)`` — Katz backoff score;
- ``score_ids(ids)`` — total sequence log-prob;
- ``rescore_nbest(hyps, lengths, am_scores, lm_weight)`` — host-side n-best
  rescoring of device beam output;
- ``step_scores(context)`` — dense (V,) next-token scores for small vocabs,
  usable as a ``lm_fn`` table in fusion.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

LOG10 = math.log(10.0)


class NgramLM:
    def __init__(self, arpa_path: str, token_map: Optional[Dict[str, int]]
                 = None, unk: str = "<unk>"):
        """token_map: word -> token id (defaults to int(word) parsing)."""
        self.logp_table: Dict[Tuple[int, ...], float] = {}
        self.backoff: Dict[Tuple[int, ...], float] = {}
        self.order = 0
        self.unk_id = -1
        tm = token_map or {}

        def to_id(w: str) -> Optional[int]:
            if w in tm:
                return tm[w]
            if token_map is None:
                try:
                    return int(w)
                except ValueError:
                    pass
            if w == unk:
                return self.unk_id
            if w == "<s>":
                return -2
            if w == "</s>":
                return -3
            return None

        cur_n = 0
        with open(arpa_path, "r", encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("\\data\\"):
                    continue
                if line.startswith("\\") and "-grams:" in line:
                    cur_n = int(line[1:].split("-")[0])
                    self.order = max(self.order, cur_n)
                    continue
                if line.startswith("\\end\\") or line.startswith("ngram "):
                    continue
                parts = line.split()
                if len(parts) < cur_n + 1:
                    continue
                lp = float(parts[0]) * LOG10
                words = parts[1: 1 + cur_n]
                bo = float(parts[1 + cur_n]) * LOG10 \
                    if len(parts) > 1 + cur_n else 0.0
                ids = tuple(to_id(w) for w in words)
                if any(i is None for i in ids):
                    continue
                self.logp_table[ids] = lp
                if bo != 0.0:
                    self.backoff[ids] = bo

    # --------------------------------------------------------------- scoring
    def logp(self, context: Sequence[int], token: int) -> float:
        """Katz backoff P(token | context)."""
        ctx = tuple(context)[-(self.order - 1):] if self.order > 1 else ()
        return self._score(ctx, int(token))

    def _score(self, ctx: Tuple[int, ...], token: int) -> float:
        ng = ctx + (token,)
        if ng in self.logp_table:
            return self.logp_table[ng]
        if not ctx:
            return self.logp_table.get(
                (token,), self.logp_table.get((self.unk_id,), -20.0))
        return self.backoff.get(ctx, 0.0) + self._score(ctx[1:], token)

    def score_ids(self, ids: Sequence[int], bos: bool = True) -> float:
        ctx: List[int] = [-2] if bos else []
        total = 0.0
        for t in ids:
            total += self.logp(ctx, int(t))
            ctx.append(int(t))
        return total

    def step_scores(self, context: Sequence[int], vocab: int) -> np.ndarray:
        """(V,) next-token log-probs (dense; for fusion on small vocabs)."""
        return np.asarray([self.logp(context, v) for v in range(vocab)],
                          np.float32)

    # ------------------------------------------------------------- rescoring
    def rescore_nbest(self, hyps: np.ndarray, lengths: np.ndarray,
                      am_scores: np.ndarray, lm_weight: float = 0.3
                      ) -> Tuple[np.ndarray, np.ndarray]:
        """hyps (B, K, L), lengths (B, K), am_scores (B, K) -> reordered
        (indices (B, K), fused scores (B, K))."""
        B, K, _ = hyps.shape
        fused = np.array(am_scores, np.float64)
        for b in range(B):
            for k in range(K):
                n = int(lengths[b, k])
                fused[b, k] += lm_weight * self.score_ids(hyps[b, k, :n])
        order = np.argsort(-fused, axis=1)
        return order, np.take_along_axis(fused, order, axis=1)

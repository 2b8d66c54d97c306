"""Hotword bias LM for decoding (reference runtime/onnxruntime/src/
bias-lm.cpp — prefix-tree LM over hotword token lists used to bias WFST
beam search; here the same prefix-tree biasing is a dense, device-resident
table plugged into the tensor beam search).

``build_bias_trie`` compiles hotword token sequences into two dense
arrays:

- ``next_state[s, v]`` — trie state after emitting token ``v`` in state
  ``s`` (root fallback when ``v`` leaves the trie);
- ``bonus[s, v]`` — incremental log-score: ``+bonus`` per token while
  advancing a hotword, committed on completion; abandoning a partial
  match cancels the uncommitted credit (the classic shallow-fusion
  contextual-biasing scheme, score-neutral for non-hotword paths).

On device this is two gathers per beam step: ``bonus[state]`` joins the
next-token scores and ``next_state[state, tok]`` advances the per-
hypothesis state — no host round-trips, O(K) memory.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def build_bias_trie(hotwords: Sequence[Sequence[int]], vocab: int,
                    bonus: float = 3.0) -> Tuple[np.ndarray, np.ndarray]:
    """Compile hotwords -> (next_state (S, V) int32, score (S, V) f32)."""
    children: List[dict] = [{}]
    depth = [0]
    terminal = [False]
    for hw in hotwords:
        cur = 0
        for t in hw:
            t = int(t)
            if t not in children[cur]:
                children.append({})
                depth.append(depth[cur] + 1)
                terminal.append(False)
                children[cur][t] = len(children) - 1
            cur = children[cur][t]
        terminal[cur] = True

    n = len(children)
    # commit_depth: depth of the longest terminal prefix on the path to s
    commit_depth = [0] * n

    def walk(s, best):
        if terminal[s]:
            best = depth[s]
        commit_depth[s] = best
        for c in children[s].values():
            walk(c, best)

    walk(0, 0)

    next_state = np.zeros((n, vocab), np.int32)
    score = np.zeros((n, vocab), np.float32)
    root_children = children[0]
    for s in range(n):
        uncommitted = depth[s] - commit_depth[s]
        # default: leave the trie -> cancel uncommitted credit, fall to root
        score[s, :] = -bonus * uncommitted
        next_state[s, :] = 0
        # root re-entry: a token that starts a hotword still earns credit
        for t, c in root_children.items():
            score[s, t] = -bonus * uncommitted + bonus
            next_state[s, t] = 0 if (terminal[c] and not children[c]) else c
        # true advance inside the trie
        for t, c in children[s].items():
            score[s, t] = bonus
            if terminal[c] and not children[c]:
                next_state[s, t] = 0  # completed leaf: commit, back to root
            else:
                next_state[s, t] = c
    return next_state, score


def bias_path_score(next_state: np.ndarray, score: np.ndarray,
                    tokens: Sequence[int]) -> float:
    """Host-side helper: total bias score of a token path (for tests and
    N-best rescoring)."""
    s, total = 0, 0.0
    for t in tokens:
        total += float(score[s, int(t)])
        s = int(next_state[s, int(t)])
    return total

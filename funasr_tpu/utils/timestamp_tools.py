"""CIF-peak timestamp prediction + sentence stitching.

Reference: funasr/utils/timestamp_tools.py:31 ``ts_prediction_lfr6_standard``
(fire positions -> per-token [start_ms, end_ms] at the LFR6 60ms frame rate)
and :108 ``timestamp_sentence`` (split token timestamps into sentences at
punctuation marks).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

FRAME_MS = 60  # LFR6: 10 ms shift x 6


def ts_prediction_lfr6_standard(
    peaks: np.ndarray,  # (T,) bool or fire track values
    alphas: np.ndarray,  # (T,) alphas (unused in the standard variant)
    tokens: List[str],
    vad_offset: int = 0,
    force_time_shift: float = -1.5,
) -> Tuple[str, List[List[int]]]:
    """Assign each token the span between consecutive CIF fires.

    Returns (kaldi-style string, [[start_ms, end_ms], ...]).  Fire at frame f
    means a token ends there; starts are the previous fire (shifted by
    ``force_time_shift`` frames like the reference to compensate CIF delay).
    """
    peaks = np.asarray(peaks)
    if peaks.dtype != np.bool_:
        peaks = peaks > (1.0 - 1e-4)
    fire_idx = np.nonzero(peaks)[0]
    n = min(len(tokens), len(fire_idx))
    ts: List[List[int]] = []
    prev = 0.0
    for i in range(n):
        end = float(fire_idx[i]) + 1.0
        start = max(prev + force_time_shift if i == 0 else prev, 0.0)
        begin_ms = int(start * FRAME_MS) + vad_offset
        end_ms = int(end * FRAME_MS) + vad_offset
        ts.append([begin_ms, end_ms])
        prev = end
    # pad remaining tokens (no fire -> inherit the last end)
    for _ in range(n, len(tokens)):
        last_end = ts[-1][1] if ts else vad_offset
        ts.append([last_end, last_end + FRAME_MS])
    text = " ".join(
        f"{t} {b/1000.0:.3f} {e/1000.0:.3f}" for t, (b, e) in zip(tokens, ts)
    )
    return text, ts


SENTENCE_END = set("。？！?!.")
COMMA = set("，,、;；")


def timestamp_sentence(
    punc_array: Sequence[int],
    timestamps: List[List[int]],
    raw_tokens: List[str],
    punc_list: Sequence[str] = ("<unk>", "_", "，", "。", "？", "、"),
) -> List[dict]:
    """Stitch token timestamps into sentence_info records
    (reference timestamp_tools.py:108): each sentence = tokens up to a
    sentence-end punctuation, with [start, end] from its token spans."""
    sentences = []
    cur_tokens: List[str] = []
    cur_ts: List[List[int]] = []
    n = min(len(raw_tokens), len(timestamps), len(punc_array))
    for i in range(n):
        cur_tokens.append(raw_tokens[i])
        cur_ts.append(timestamps[i])
        punc = punc_list[punc_array[i]] if punc_array[i] < len(punc_list) else "_"
        if punc in SENTENCE_END or punc in COMMA:
            text = "".join(cur_tokens) + (punc if punc != "_" else "")
            sentences.append({
                "text": text,
                "start": cur_ts[0][0],
                "end": cur_ts[-1][1],
                "timestamp": list(cur_ts),
            })
            cur_tokens, cur_ts = [], []
    if cur_tokens:
        sentences.append({
            "text": "".join(cur_tokens),
            "start": cur_ts[0][0],
            "end": cur_ts[-1][1],
            "timestamp": list(cur_ts),
        })
    return sentences

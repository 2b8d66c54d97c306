"""KWS DET evaluation: false-alarm-per-hour vs false-reject curves.

Reference: funasr/utils/compute_det_ctc.py (adapted there from wekws'
compute_det) + funasr/utils/kws_utils.py ``split_mixed_label``.  Given
per-(utterance, keyword) detection scores (models/kws FsmnKWS.detect)
and the utterance transcripts, sweep score thresholds and report, per
keyword:

    FRR(t)  = missed detections / utterances containing the keyword
    FAR/h(t) = false alarms / total audio hours (on non-keyword utts)

which is the operating curve the reference's DET script prints.
"""

from __future__ import annotations

import re
from typing import Dict, Iterable, List, Sequence, Tuple


def split_mixed_label(input_str: str) -> List[str]:
    """Mixed zh-char / latin-word tokenization (kws_utils.py:13): latin
    runs stay words, everything else splits per character."""
    tokens: List[str] = []
    s = input_str.lower()
    while len(s) > 0:
        m = re.match(r"[a-za-z!?,<>()']+", s, re.IGNORECASE)
        word = m.group(0) if m is not None else s[0:1]
        tokens.append(word)
        s = s.replace(word, "", 1).strip(" ")
    return tokens


def contains_keyword(transcript: str, keyword: str) -> bool:
    """Keyword-in-transcript test on mixed-label token sequences (the
    reference matches the keyword token list as a sublist)."""
    t = split_mixed_label(transcript)
    k = split_mixed_label(keyword)
    if not k:
        return False
    for i in range(len(t) - len(k) + 1):
        if t[i: i + len(k)] == k:
            return True
    return False


def compute_det(
    scores: Iterable[Tuple[str, Dict[str, float], str, float]],
    keywords: Sequence[str],
    thresholds: Sequence[float] = tuple(i / 100 for i in range(0, 101)),
) -> Dict[str, List[Tuple[float, float, float]]]:
    """``scores``: iterable of (utt_key, {keyword: score}, transcript,
    duration_seconds).  Returns {keyword: [(threshold, far_per_hour,
    frr), ...]} — the DET operating points (compute_det_ctc semantics:
    FRR over keyword-positive utterances, false alarms per hour over the
    negative audio)."""
    rows = list(scores)
    out: Dict[str, List[Tuple[float, float, float]]] = {}
    for kw in keywords:
        pos, neg = [], []
        neg_secs = 0.0
        for _key, sc, text, dur in rows:
            s = float(sc.get(kw, 0.0))
            if contains_keyword(text, kw):
                pos.append(s)
            else:
                neg.append(s)
                neg_secs += float(dur)
        if not pos:
            # a keyword with zero positive utterances has no defined FRR;
            # reporting 0 would fake a perfect detector for a typo'd or
            # absent keyword (the reference divides by keyword_num and
            # fails loudly too)
            raise ValueError(
                f"keyword {kw!r} never occurs in the transcripts — "
                f"check the keyword spelling / test set")
        pts: List[Tuple[float, float, float]] = []
        neg_hours = max(neg_secs / 3600.0, 1e-12)
        for t in thresholds:
            frr = sum(1 for s in pos if s < t) / len(pos)
            fa = sum(1 for s in neg if s >= t)
            pts.append((float(t), fa / neg_hours, frr))
        out[kw] = pts
    return out


def det_at_far(points: List[Tuple[float, float, float]],
               far_per_hour: float) -> Tuple[float, float, float]:
    """Operating point with the largest FAR <= the budget (the row the
    reference tooling reports, e.g. FRR @ 1 FA/h)."""
    ok = [p for p in points if p[1] <= far_per_hour]
    if not ok:
        return min(points, key=lambda p: p[1])
    return min(ok, key=lambda p: p[2])

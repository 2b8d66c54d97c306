"""Speaker-verification metrics (reference funasr/metrics/: EER and
minDCF over trial scores).

``compute_eer(scores, labels)`` — equal error rate via the ROC crossing.
``compute_min_dcf(scores, labels, p_target, c_miss, c_fa)`` — minimum
normalized detection cost (NIST SRE definition).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np


def _roc(scores: np.ndarray, labels: np.ndarray
         ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Sweep thresholds (descending scores) -> (fnr, fpr, thresholds)."""
    order = np.argsort(-scores, kind="stable")
    s = scores[order]
    l = labels[order].astype(bool)
    n_target = max(int(l.sum()), 1)
    n_nontarget = max(int((~l).sum()), 1)
    # accepting top-k trials as "same speaker"
    tp = np.cumsum(l)
    fp = np.cumsum(~l)
    fnr = 1.0 - tp / n_target          # misses among targets
    fpr = fp / n_nontarget             # false accepts among nontargets
    # prepend the reject-everything operating point
    fnr = np.concatenate([[1.0], fnr])
    fpr = np.concatenate([[0.0], fpr])
    thr = np.concatenate([[np.inf], s])
    return fnr, fpr, thr


def compute_eer(scores: Sequence[float], labels: Sequence[int]
                ) -> Tuple[float, float]:
    """Returns (eer, threshold). labels: 1 = same speaker."""
    scores = np.asarray(scores, np.float64)
    labels = np.asarray(labels)
    fnr, fpr, thr = _roc(scores, labels)
    idx = int(np.nanargmin(np.abs(fnr - fpr)))
    eer = float((fnr[idx] + fpr[idx]) / 2.0)
    return eer, float(thr[idx])


def compute_min_dcf(scores: Sequence[float], labels: Sequence[int],
                    p_target: float = 0.01, c_miss: float = 1.0,
                    c_fa: float = 1.0) -> Tuple[float, float]:
    """Minimum normalized detection cost -> (min_dcf, threshold)."""
    scores = np.asarray(scores, np.float64)
    labels = np.asarray(labels)
    fnr, fpr, thr = _roc(scores, labels)
    dcf = c_miss * p_target * fnr + c_fa * (1.0 - p_target) * fpr
    denom = min(c_miss * p_target, c_fa * (1.0 - p_target))
    idx = int(np.argmin(dcf))
    return float(dcf[idx] / max(denom, 1e-12)), float(thr[idx])

"""Speaker clustering backend + diarization utilities (reference
funasr/models/campplus/cluster_backend.py ``ClusterBackend``,
funasr/models/campplus/utils.py ``sv_chunk``/``distribute_spk``).

Spectral clustering on cosine affinity with eigen-gap speaker-count
estimation; small-sample fallback to agglomerative merging by cosine
threshold.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np


def cosine_affinity(emb: np.ndarray) -> np.ndarray:
    x = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-8)
    return x @ x.T


def _refine(aff: np.ndarray, p: float = 0.2) -> np.ndarray:
    """Row-wise thresholding + symmetrization (standard SC refinement)."""
    n = aff.shape[0]
    keep = max(1, int(np.ceil(n * p)))
    out = aff.copy()
    for i in range(n):
        thresh = np.sort(out[i])[-keep]
        out[i, out[i] < thresh] = 0.0
    return np.maximum(out, out.T)


class ClusterBackend:
    def __init__(self, merge_thr: float = 0.78, max_spk_num: int = 15,
                 min_cluster_points: int = 4):
        self.merge_thr = merge_thr
        self.max_spk_num = max_spk_num
        self.min_cluster_points = min_cluster_points

    def __call__(self, embeddings: np.ndarray,
                 oracle_num: Optional[int] = None) -> np.ndarray:
        n = len(embeddings)
        if n == 0:
            return np.zeros((0,), np.int32)
        if n < 20:
            # too few chunks to cluster reliably: single speaker
            # (reference cluster_backend.py:154)
            return np.zeros((n,), np.int32)
        aff = _refine(cosine_affinity(embeddings))
        # normalized laplacian eigen-gap for speaker count
        d = np.maximum(aff.sum(axis=1), 1e-8)
        d_inv = 1.0 / np.sqrt(d)
        lap = np.eye(n) - d_inv[:, None] * aff * d_inv[None, :]
        vals, vecs = np.linalg.eigh(lap)
        if oracle_num is not None:
            k = oracle_num
        else:
            kmax = min(self.max_spk_num, n - 1)
            gaps = np.diff(vals[: kmax + 1])
            k = int(np.argmax(gaps)) + 1
            k = max(1, k)
        if k == 1:
            labels = np.zeros((n,), np.int32)
        else:
            from sklearn.cluster import KMeans

            spec = vecs[:, :k]
            spec = spec / np.maximum(
                np.linalg.norm(spec, axis=1, keepdims=True), 1e-8)
            labels = KMeans(n_clusters=k, n_init=10, random_state=0).fit(
                spec).labels_.astype(np.int32)
        labels = self._merge_small(embeddings, labels)
        if oracle_num is None:
            labels = self.merge_by_cos(embeddings, labels, self.merge_thr)
        return labels

    def merge_by_cos(self, emb, labels, cos_thr):
        """Iteratively merge the most-similar centroid pair while its
        cosine >= cos_thr (reference cluster_backend.py:167)."""
        labels = labels.copy()
        while True:
            uniq = sorted(set(labels.tolist()))
            if len(uniq) == 1:
                break
            cents = np.stack([emb[labels == u].mean(axis=0) for u in uniq])
            cents = cents / np.maximum(
                np.linalg.norm(cents, axis=1, keepdims=True), 1e-8)
            aff = np.triu(cents @ cents.T, 1)
            i, j = np.unravel_index(int(np.argmax(aff)), aff.shape)
            if aff[i, j] < cos_thr:
                break
            labels[labels == uniq[j]] = uniq[i]
        # contiguous ids in order of appearance
        remap = {}
        out = np.zeros_like(labels)
        for t, l in enumerate(labels):
            if l not in remap:
                remap[l] = len(remap)
            out[t] = remap[l]
        return out

    def _merge_small(self, emb, labels):
        """Merge clusters with too few points / too-similar centroids."""
        labels = labels.copy()
        changed = True
        while changed and len(set(labels.tolist())) > 1:
            changed = False
            uniq = sorted(set(labels.tolist()))
            cents = {u: emb[labels == u].mean(axis=0) for u in uniq}
            for u in uniq:
                if np.sum(labels == u) < self.min_cluster_points:
                    others = [v for v in uniq if v != u]
                    sims = [
                        float(np.dot(cents[u], cents[v])
                              / (np.linalg.norm(cents[u])
                                 * np.linalg.norm(cents[v]) + 1e-8))
                        for v in others
                    ]
                    tgt = others[int(np.argmax(sims))]
                    labels[labels == u] = tgt
                    changed = True
                    break
        # relabel to contiguous ids in order of appearance
        remap = {}
        out = np.zeros_like(labels)
        for i, l in enumerate(labels):
            if l not in remap:
                remap[l] = len(remap)
            out[i] = remap[l]
        return out


def sv_chunk(segment: Sequence, chunk_s: float = 1.5, step_s: float = 0.75,
             fs: int = 16000) -> List[List]:
    """Split a [start_s, end_s, wav] VAD segment into fixed sliding chunks
    for embedding extraction (reference utils.py:66 sv_chunk): the final
    chunk is RIGHT-ALIGNED (start pulled back to end-chunk_s) so segment
    tails keep embedding coverage; sub-chunk segments are zero-padded."""
    start, end, wav = segment
    n = len(wav)
    chunk_len = int(chunk_s * fs)
    shift = int(step_s * fs)
    out = []
    last_ed = 0
    for st in range(0, n, shift):
        ed = min(st + chunk_len, n)
        if ed <= last_ed:
            break
        last_ed = ed
        st = max(0, ed - chunk_len)
        data = wav[st:ed]
        if len(data) < chunk_len:
            data = np.pad(data, (0, chunk_len - len(data)))
        out.append([start + st / fs, start + ed / fs, data])
    return out


def distribute_spk(sentence_list: List[dict], sd_segments: List[List]
                   ) -> List[dict]:
    """Assign a speaker id to each sentence by maximal time overlap with the
    diarization segments (reference utils.py distribute_spk)."""
    for sent in sentence_list:
        best, best_overlap = 0, 0.0
        for start_ms, end_ms, spk in sd_segments:
            ov = min(sent["end"], end_ms) - max(sent["start"], start_ms)
            if ov > best_overlap:
                best_overlap = ov
                best = spk
        sent["spk"] = int(best)
    return sentence_list

"""CAM++ embedding model + clustering backend tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from funasr_tpu.models.campplus.cluster import (
    ClusterBackend,
    distribute_spk,
    sv_chunk,
)
from funasr_tpu.models.campplus.model import CAMPPlus


def test_campplus_embedding_shapes(rng):
    model = CAMPPlus(feat_dim=16, embedding_size=24, growth_rate=4,
                     bn_size=2, init_channels=8,
                     blocks=((2, 3, 1), (2, 3, 2)))
    feats = jnp.asarray(rng.standard_normal((2, 120, 16)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), feats)
    emb = model.apply(variables, feats)
    assert emb.shape == (2, 24)
    assert np.isfinite(np.asarray(emb)).all()
    # different time lengths give independent (deterministic) embeddings
    emb2 = model.apply(variables, feats[:, :100])
    assert emb2.shape == (2, 24)


def test_cluster_backend_two_speakers(rng):
    c1 = rng.standard_normal(32)
    c2 = rng.standard_normal(32)
    emb = np.stack([c1 + 0.05 * rng.standard_normal(32) for _ in range(10)]
                   + [c2 + 0.05 * rng.standard_normal(32) for _ in range(10)])
    labels = ClusterBackend()(emb)
    assert len(set(labels[:10].tolist())) == 1
    assert len(set(labels[10:].tolist())) == 1
    assert labels[0] != labels[10]


def test_cluster_backend_oracle_and_single(rng):
    emb = rng.standard_normal((6, 16))
    labels = ClusterBackend()(emb, oracle_num=1)
    assert (labels == 0).all()
    assert len(ClusterBackend()(np.zeros((0, 8)))) == 0


def test_sv_chunk_and_distribute():
    wav = np.zeros(16000 * 3, np.float32)
    chunks = sv_chunk([0.0, 3.0, wav], chunk_s=1.5, step_s=0.75)
    assert len(chunks) == 3
    assert all(abs((c[1] - c[0]) - 1.5) < 1e-6 for c in chunks)

    sents = [{"start": 0, "end": 1000}, {"start": 2000, "end": 3000}]
    sd = [[0, 1500, 0], [1500, 3000, 1]]
    out = distribute_spk(sents, sd)
    assert out[0]["spk"] == 0 and out[1]["spk"] == 1


def test_cluster_few_chunks_single_speaker(rng):
    """<20 chunks -> all one speaker (reference cluster_backend.py:154)."""
    from funasr_tpu.models.campplus.cluster import ClusterBackend

    emb = rng.standard_normal((12, 16)).astype(np.float32)
    labels = ClusterBackend()(emb)
    assert (labels == 0).all()


def test_cluster_merge_by_cos(rng):
    """Two nearby blobs whose centroid cosine exceeds merge_thr collapse
    into one speaker (reference merge_by_cos)."""
    from funasr_tpu.models.campplus.cluster import ClusterBackend

    base = rng.standard_normal(16).astype(np.float32)
    a = base + 0.05 * rng.standard_normal((15, 16)).astype(np.float32)
    b = base + 0.05 * rng.standard_normal((15, 16)).astype(np.float32)
    emb = np.concatenate([a, b + 0.2], axis=0)
    labels = ClusterBackend(merge_thr=0.78)(emb)
    assert len(set(labels.tolist())) == 1


def test_sv_chunk_right_aligned_tail():
    """The segment tail gets a right-aligned final chunk (reference
    utils.py:84), so no part of the segment lacks coverage."""
    from funasr_tpu.models.campplus.cluster import sv_chunk

    fs = 16000
    wav = np.arange(2 * fs, dtype=np.float32)  # 2.0 s
    chunks = sv_chunk([0.0, 2.0, wav], fs=fs)
    ends = [c[1] for c in chunks]
    assert max(ends) == 2.0  # tail covered
    # the last chunk is right-aligned: starts at 0.5 s, ends at 2.0 s
    assert chunks[-1][0] == 0.5
    assert len(chunks[-1][2]) == int(1.5 * fs)
    # short segments are zero-padded to the chunk length
    short = sv_chunk([0.0, 0.5, wav[: fs // 2]], fs=fs)
    assert len(short) == 1 and len(short[0][2]) == int(1.5 * fs)

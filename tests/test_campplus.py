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

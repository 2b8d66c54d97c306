"""ERes2Net / XVector speaker embedding encoders."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from funasr_tpu.models.eres2net import ERes2Net, stats_pooling
from funasr_tpu.models.xvector import XVector


def test_stats_pooling():
    x = jnp.asarray([[[1.0, 2.0], [3.0, 4.0]]])
    out = np.asarray(stats_pooling(x))
    np.testing.assert_allclose(out[0, :2], [2.0, 3.0])
    # reference TSTP uses the UNBIASED variance: [1,3] over T=2 -> var 2
    np.testing.assert_allclose(out[0, 2:], [2.0 ** 0.5, 2.0 ** 0.5],
                               rtol=1e-5)


def test_eres2net_shapes(rng):
    m = ERes2Net(feat_dim=16, embedding_size=24, m_channels=4,
                 layers=(1, 1, 1, 1))
    feats = jnp.asarray(rng.standard_normal((2, 64, 16)), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), feats)
    emb = m.apply(variables, feats)
    assert emb.shape == (2, 24)
    assert np.isfinite(np.asarray(emb)).all()


def test_eres2net_train_updates_batchstats(rng):
    m = ERes2Net(feat_dim=8, embedding_size=8, m_channels=4, layers=(1, 1))
    feats = jnp.asarray(rng.standard_normal((2, 32, 8)), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), feats)
    emb, updates = m.apply(variables, feats, train=True,
                           mutable=["batch_stats"])
    assert emb.shape == (2, 8)
    assert "batch_stats" in updates


def test_xvector_shapes(rng):
    m = XVector(feat_dim=16, embedding_size=32, channels=(8, 8, 16),
                kernels=(5, 3, 1), dilations=(1, 2, 1))
    feats = jnp.asarray(rng.standard_normal((3, 50, 16)), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), feats)
    emb = m.apply(variables, feats)
    assert emb.shape == (3, 32)
    assert np.isfinite(np.asarray(emb)).all()


def test_spk_engine_accepts_eres2net(rng):
    """ERes2Net plugs into the SpkEngine contract used by AutoModel."""
    from funasr_tpu.auto.engines import SpkEngine

    m = ERes2Net(feat_dim=80, embedding_size=16, m_channels=4,
                 layers=(1, 1))
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 100, 80)))
    eng = SpkEngine(m, variables)
    wavs = [rng.standard_normal(16000).astype(np.float32),
            rng.standard_normal(16000).astype(np.float32),
            rng.standard_normal(8000).astype(np.float32)]
    emb = eng.embed(wavs)
    assert emb.shape == (3, 16)
    assert np.isfinite(emb).all()


def test_eres2net_matches_reference_torch(rng):
    """Converted reference ERes2Net produces the same embeddings (AFF
    concat-gating, diff_AFF blocks, bare downsample convs, channel-major
    unbiased TSTP — eres2net.py:43-246, fusion.py:8)."""
    import sys
    sys.path.insert(0, "tests")
    import pytest
    torch = pytest.importorskip("torch")
    from reference_torch import load_reference
    from funasr_tpu.convert import eres2net_from_torch

    m = load_reference("funasr.models.eres2net.eres2net")
    torch.manual_seed(0)
    layers = (1, 1, 1, 1)
    ref = m.ERes2Net(num_blocks=list(layers), m_channels=4, feat_dim=16,
                     embedding_size=24).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables = eres2net_from_torch(sd, layers=layers)

    ours = ERes2Net(feat_dim=16, embedding_size=24, m_channels=4,
                    layers=layers)
    x = rng.standard_normal((2, 64, 16)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(ours.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

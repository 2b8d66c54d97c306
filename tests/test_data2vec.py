"""data2vec SSL: EMA teacher math + pretrain step (wav2vec2-style encoder
over fbank features, reference funasr/models/data2vec/)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from funasr_tpu.models.data2vec import Data2Vec, ema_update


def _trunk(p):
    return {"params": {k: v for k, v in p["params"].items()
                       if k != "final_proj"}}


def test_ema_update():
    t = {"a": jnp.ones(3)}
    s = {"a": jnp.zeros(3)}
    out = ema_update(t, s, decay=0.9)
    np.testing.assert_allclose(np.asarray(out["a"]), 0.9)


def test_pretrain_step(rng):
    m = Data2Vec(input_size=20, dim=16, depth=2, n_head=2, ffn=32,
                 ema_decay=0.5, average_top_k_layers=2)
    student, teacher = m.init_params(jax.random.PRNGKey(0), n=32)
    feats = jnp.asarray(rng.standard_normal((1, 32, 20)), jnp.float32)
    lens = jnp.array([32], jnp.int32)
    loss, grads, _ = m.pretrain_step(student, teacher, feats, lens,
                                     jax.random.PRNGKey(1))
    # the masked-frame corruption makes reconstruction non-trivial: even an
    # identical student/teacher trunk has loss and gradient
    assert float(loss) > 1e-4
    gsum = jax.tree_util.tree_reduce(
        lambda a, g: a + float(jnp.sum(jnp.abs(g))), grads, 0.0)
    assert gsum > 0
    student2 = jax.tree_util.tree_map(lambda v: v + 0.01, student)
    loss2, _, _ = m.pretrain_step(student2, teacher, feats, lens,
                                  jax.random.PRNGKey(1))
    assert float(loss2) > 0
    # EMA merge moves the teacher toward the student trunk
    t2 = m.update_teacher(teacher, student2)

    def dist(a, b):
        per_leaf = jax.tree_util.tree_map(
            lambda x, y: float(jnp.sum(jnp.abs(x - y))), a, b)
        return jax.tree_util.tree_reduce(lambda acc, v: acc + v, per_leaf,
                                         0.0)

    d0 = dist(teacher, _trunk(student2))
    d1 = dist(t2, _trunk(student2))
    assert d1 == pytest.approx(d0 * 0.5, rel=1e-3)  # decay 0.5 halves it


def test_extract_features_shapes(rng):
    from funasr_tpu.models.data2vec import Data2VecEncoder

    enc = Data2VecEncoder(input_size=20, encoder_layers=2,
                          encoder_embed_dim=16, encoder_ffn_embed_dim=32,
                          encoder_attention_heads=2)
    feats = jnp.asarray(rng.standard_normal((2, 32, 20)), jnp.float32)
    lens = jnp.array([32, 24], jnp.int32)
    p = enc.init(jax.random.PRNGKey(0), feats, lens)
    x, out_lens = enc.apply(p, feats, lens, method=enc.extract_features)
    assert x.shape == (2, 8, 16)  # two stride-2 convs: 32 -> 8
    assert out_lens.tolist() == [8, 6]

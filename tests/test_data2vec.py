"""data2vec SSL: EMA teacher math + pretrain step."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from funasr_tpu.models.data2vec import Data2Vec, ema_update


def test_ema_update():
    t = {"a": jnp.ones(3)}
    s = {"a": jnp.zeros(3)}
    out = ema_update(t, s, decay=0.9)
    np.testing.assert_allclose(np.asarray(out["a"]), 0.9)


def test_pretrain_step(rng):
    m = Data2Vec(dim=16, depth=2, n_head=2, ffn=32, ema_decay=0.5)
    student, teacher = m.init_params(jax.random.PRNGKey(0), n=3200)
    wav = jnp.asarray(rng.standard_normal((1, 3200)), jnp.float32)
    lens = jnp.array([3200], jnp.int32)
    loss, grads, _ = m.pretrain_step(student, teacher, wav, lens,
                                     jax.random.PRNGKey(1))
    # the masked-frame corruption makes reconstruction non-trivial: even an
    # identical student/teacher pair has loss and gradient (the old
    # degenerate objective gave exactly zero and trained nothing)
    assert float(loss) > 1e-4
    gsum = jax.tree_util.tree_reduce(
        lambda a, g: a + float(jnp.sum(jnp.abs(g))), grads, 0.0)
    assert gsum > 0
    student2 = jax.tree_util.tree_map(lambda v: v + 0.01, student)
    loss2, grads2, _ = m.pretrain_step(student2, teacher, wav, lens,
                                       jax.random.PRNGKey(1))
    assert float(loss2) > 0
    # EMA merge moves the teacher toward the student
    t2 = m.update_teacher(teacher, student2)

    def dist(a, b):
        per_leaf = jax.tree_util.tree_map(
            lambda x, y: float(jnp.sum(jnp.abs(x - y))), a, b)
        return jax.tree_util.tree_reduce(lambda acc, v: acc + v, per_leaf, 0.0)

    d0 = dist(teacher, student2)
    d1 = dist(t2, student2)
    assert d1 == pytest.approx(d0 * 0.5, rel=1e-3)  # decay 0.5 halves the gap

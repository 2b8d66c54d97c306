"""CT-Transformer punctuation: forward, loss, window loop, text assembly."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from funasr_tpu.models.ct_transformer.model import (
    CTTransformer,
    CTTransformerModel,
    split_to_mini_sentence,
    split_words,
)
from funasr_tpu.tokenizer.char_tokenizer import CharTokenizer

PUNC = ["<unk>", "_", "，", "。", "？", "、"]
VOCAB = ["<blank>", "<s>", "</s>"] + list("我们今天去公园玩吧好的") + ["hello", "world"]
ENC = dict(output_size=16, attention_heads=2, linear_units=32, num_blocks=2,
           kernel_size=5, dropout_rate=0.0)


def test_split_words():
    assert split_words("我们 hello world 好") == ["我", "们", "hello", "world", "好"]
    assert split_words("你好world") == ["你", "好", "world"]
    assert split_to_mini_sentence(list(range(7)), 3) == [[0, 1, 2], [3, 4, 5], [6]]


@pytest.fixture(scope="module")
def punc_model():
    m = CTTransformerModel(
        vocab_size=len(VOCAB), punc_list=PUNC, embed_unit=16, att_unit=16,
        encoder_conf=ENC,
    )
    m.init_params(jax.random.PRNGKey(0))
    return m


def test_forward_and_loss(punc_model, rng):
    mod = punc_model.module
    text = jnp.asarray(rng.integers(0, len(VOCAB), (2, 10)), jnp.int32)
    lens = jnp.array([10, 7])
    logits = mod.apply(punc_model.params, text, lens)
    assert logits.shape == (2, 10, len(PUNC))
    punc = jnp.asarray(rng.integers(1, len(PUNC), (2, 10)), jnp.int32)
    loss = mod.apply(punc_model.params, text, punc, lens,
                     deterministic=True, method=mod.loss)
    assert np.isfinite(float(loss))


def test_inference_window_loop(punc_model):
    tok = CharTokenizer(token_list=VOCAB)
    text = " ".join(["我 们 今 天 去 公 园 玩"] * 6)  # 48 tokens, 3 windows
    out = punc_model.inference(text, tok, split_size=20)
    assert len(out["punc_array"]) == 48
    # ends with a sentence end
    assert out["text"][-1] in ("。", ".", "？", "?")
    # all original characters preserved in order
    stripped = [c for c in out["text"] if c in "我们今天去公园玩"]
    assert "".join(stripped) == "我们今天去公园玩" * 6


def test_inference_empty(punc_model):
    tok = CharTokenizer(token_list=VOCAB)
    out = punc_model.inference("", tok)
    assert out["text"] == ""


def test_assemble_spacing(punc_model):
    # ascii words: spaces between, ascii punctuation; capitalize after 。
    words = ["hello", "world", "好"]
    puncs = np.array([3, 1, 2])  # hello。 world(_) 好，
    s = punc_model._assemble(words, puncs)
    # first ascii word capitalized too (reference model.py:330)
    assert "Hello." in s
    assert " World" in s  # capitalized after sentence end, space-joined
    assert s.endswith("好，")


# ---------------------------------------------------------- streaming punc
from funasr_tpu.models.ct_transformer.streaming import (  # noqa: E402
    CTTransformerStreamingModel,
    vad_mask,
)


def test_vad_mask_structure():
    m = vad_mask(5, 3)
    # rows before the vad point (0,1) cannot see cols >= 3
    assert m[0, 3] == 0 and m[1, 4] == 0
    # row at vad_pos-1 and later see everything
    assert m[2].min() == 1 and m[3].min() == 1
    # degenerate positions -> all ones
    assert vad_mask(4, 0).min() == 1 and vad_mask(4, 4).min() == 1


@pytest.fixture(scope="module")
def stream_punc():
    m = CTTransformerStreamingModel(
        vocab_size=len(VOCAB), punc_list=PUNC, embed_unit=16, att_unit=16,
        encoder_conf=ENC,
    )
    m.init_params(jax.random.PRNGKey(0))
    m.set_tokenizer(CharTokenizer(token_list=VOCAB))
    return m


def test_streaming_punc_incremental(stream_punc):
    cache = {}
    out1 = stream_punc.punctuate_streaming("我们今天", cache)
    # nothing may commit yet (random weights) but the call must be well-formed
    assert "punc_array" in out1 and isinstance(out1["text"], str)
    committed1 = out1["text"]
    out2 = stream_punc.punctuate_streaming("去公园玩", cache)
    out3 = stream_punc.punctuate_streaming("好的", cache, is_final=True)
    # final flush leaves nothing cached and ends with sentence punctuation
    assert cache["words"] == []
    full = committed1 + out2["text"] + out3["text"]
    assert full  # all words emitted
    assert full[-1] in ("。", "？", ".", "?")


def test_streaming_punc_empty(stream_punc):
    out = stream_punc.punctuate_streaming("", {}, is_final=True)
    assert out["text"] == "" and len(out["punc_array"]) == 0


def test_streaming_punc_force_break_bounds_cache(stream_punc):
    """A stream whose model only ever predicts commas must still commit
    (force-break at the comma past cache_pop_trigger_limit=200 words), so
    the carry and per-call forward length stay bounded."""
    model = stream_punc
    comma_id = model.punc_list.index("，")

    def all_commas(ids, vad_pos):
        return np.full((len(ids),), comma_id, np.int64)

    orig = model._punc_ids_masked
    model._punc_ids_masked = all_commas
    try:
        cache = {}
        committed = 0
        for _ in range(30):  # 30 x 20 words = 600 words
            out = model.punctuate_streaming("我们 " * 20, cache=cache)
            committed += len(out["punc_array"])
            assert len(cache["words"]) <= 201  # bounded carry
        assert committed > 0  # the force-break actually commits
        # the promoted break is a sentence end
        out = model.punctuate_streaming("", cache=cache, is_final=True)
    finally:
        model._punc_ids_masked = orig

"""SenseVoiceSmall + CTC greedy decode + rich postprocess tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from funasr_tpu.models.sense_voice.model import (
    SenseVoiceSmall,
    lid_id,
    textnorm_id,
)
from funasr_tpu.ops.ctc_decode import ctc_greedy_decode
from funasr_tpu.utils.postprocess import (
    rich_transcription_postprocess,
    sentence_postprocess,
)

CONF = dict(
    vocab_size=40,
    input_size=24,
    encoder_conf=dict(output_size=16, attention_heads=2, linear_units=32,
                      num_blocks=3, tp_blocks=2, kernel_size=5,
                      dropout_rate=0.0),
)


def test_ctc_greedy_decode():
    # B=1, T=6, V=4; blank=0: [1 1 0 2 2 3] -> [1 2 3]
    path = jnp.array([[1, 1, 0, 2, 2, 3]])
    logp = jax.nn.one_hot(path, 4) * 10.0
    toks, lens = ctc_greedy_decode(logp, jnp.array([6]))
    assert int(lens[0]) == 3
    np.testing.assert_array_equal(np.asarray(toks[0, :3]), [1, 2, 3])
    # length masking: only first 3 frames -> [1]
    toks, lens = ctc_greedy_decode(logp, jnp.array([3]))
    assert int(lens[0]) == 1


def test_sensevoice_forward_and_decode(rng):
    model = SenseVoiceSmall(**CONF)
    B, T, U = 2, 20, 10
    speech = jnp.asarray(rng.standard_normal((B, T, 24)), jnp.float32)
    slens = jnp.array([T, T - 5])
    text = jnp.asarray(rng.integers(1, 40, (B, U)), jnp.int32)
    tlens = jnp.full((B,), U, jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
                        speech, slens, text, tlens)
    loss, stats = model.apply(params, speech, slens, text, tlens,
                              deterministic=True)
    assert np.isfinite(float(loss))
    assert np.isfinite(float(stats["loss_ctc"]))

    lid = jnp.full((B,), lid_id("zh"), jnp.int32)
    tn = jnp.full((B,), textnorm_id(False), jnp.int32)
    toks, lens = model.apply(params, speech, slens, lid, tn,
                             method=model.greedy_decode)
    assert toks.shape[0] == B
    assert (np.asarray(lens) <= T + 4).all()


def test_rich_postprocess():
    s = "<|zh|><|HAPPY|><|Speech|><|woitn|>你好世界<|HAPPY|>"
    out = rich_transcription_postprocess(s)
    assert "你好世界" in out
    assert "<|" not in out
    assert "😊" in out


def test_sentence_postprocess():
    text, words = sentence_postprocess(["你", "好", "hello", "world", "了"])
    assert text == "你好 hello world了" or text == "你好 hello world 了"
    # BPE merge
    text2, _ = sentence_postprocess(["he@@", "llo", "世"])
    assert "hello" in text2


def test_sensevoice_forced_align_timestamps(rng):
    """greedy_decode_with_alignment: alignment collapses to the decoded
    speech tokens; engine timestamp conversion yields ordered ms pairs
    (reference sense_voice/model.py:918 output_timestamp path)."""
    model = SenseVoiceSmall(**CONF)
    B, T = 2, 24
    speech = jnp.asarray(rng.standard_normal((B, T, 24)), jnp.float32)
    slens = jnp.array([T, T - 6])
    lid = jnp.full((B,), lid_id("zh"), jnp.int32)
    tn = jnp.full((B,), textnorm_id(False), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, speech, slens,
                        lid, tn, method=model.greedy_decode)
    toks, lens, align = model.apply(
        params, speech, slens, lid, tn,
        method=model.greedy_decode_with_alignment)
    toks = np.asarray(toks); lens = np.asarray(lens)
    align = np.asarray(align)
    for i in range(B):
        speech_tokens = [t for t in toks[i, 4:int(lens[i])].tolist()
                         if t != 0]
        collapsed, prev = [], None
        for a in align[i].tolist():
            if a != 0 and a != prev:
                collapsed.append(a)
            prev = a
        assert collapsed == speech_tokens

    from funasr_tpu.auto.engines import _ctc_align_timestamps

    names = [f"t{t}" for t in range(40)]
    for i in range(B):
        n_sp = len([t for t in toks[i, 4:int(lens[i])] if t != 0])
        ts = _ctc_align_timestamps(
            align[i], [names[t] for t in toks[i, 4:int(lens[i])]],
            offset_ms=100)
        assert len(ts) == n_sp
        for s, e in ts:
            assert 100 <= s <= e

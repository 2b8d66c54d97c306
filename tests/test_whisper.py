"""Whisper wrapper: tiny random-init graph encode/decode."""

import numpy as np
import jax.numpy as jnp
import pytest

from funasr_tpu.models.whisper.model import WhisperWrap


@pytest.mark.slow
def test_whisper_tiny_graph(rng):
    w = WhisperWrap(size="tiny", dtype=jnp.float32,
                    config_overrides=dict(max_source_positions=100,
                                          max_target_positions=64,
                                          vocab_size=100,
                                          decoder_start_token_id=50,
                                          eos_token_id=51,
                                          encoder_ffn_dim=256,
                                          decoder_ffn_dim=256))
    feats = jnp.asarray(rng.standard_normal((1, 80, 200)), jnp.float32)
    enc = w.encode(feats)
    assert enc.shape[0] == 1 and enc.shape[-1] == 384
    toks = w.greedy_decode(feats, max_tokens=4)
    assert toks.shape == (1, 4)
    assert np.asarray(toks).max() < 100


@pytest.mark.slow
def test_whisper_engine_via_automodel(rng):
    from funasr_tpu.auto.auto_model import AutoModel

    cfg = dict(
        model="Whisper", size="tiny", max_tokens=4,
        config_overrides=dict(max_source_positions=1500,
                              max_target_positions=32, vocab_size=100,
                              decoder_start_token_id=50, eos_token_id=51,
                              encoder_ffn_dim=128, decoder_ffn_dim=128),
    )
    am = AutoModel(model=cfg)
    wav = (0.1 * rng.standard_normal(16000)).astype(np.float32)
    res = am.generate([wav], key=["w"])
    assert len(res) == 1
    assert "raw_tokens" in res[0] and len(res[0]["raw_tokens"]) <= 4


@pytest.mark.slow
def test_whisper_lid(rng):
    from funasr_tpu.models.whisper.model import WhisperLID

    w = WhisperLID(size="tiny", dtype=jnp.float32,
                   language_token_ids=[60, 61, 62],
                   config_overrides=dict(max_source_positions=100,
                                         max_target_positions=64,
                                         vocab_size=100,
                                         decoder_start_token_id=50,
                                         eos_token_id=51,
                                         encoder_ffn_dim=256,
                                         decoder_ffn_dim=256))
    feats = jnp.asarray(rng.standard_normal((2, 80, 200)), jnp.float32)
    probs = w.detect_language(feats, [60, 61, 62])
    assert probs.shape == (2, 3)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, rtol=1e-5)
    toks, probs2 = w.transcribe_with_lid(feats, max_tokens=3)
    assert toks.shape == (2, 3)

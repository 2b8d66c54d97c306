"""Qwen-Audio composition: whisper encoder -> adaptor -> LLM."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from funasr_tpu.models.qwen_audio.model import QwenAudio


@pytest.mark.slow
def test_qwen_audio_generate_and_loss(rng):
    qa = QwenAudio(
        vocab_size=16, whisper_size="tiny",
        whisper_overrides=dict(max_source_positions=50,
                               max_target_positions=32, vocab_size=40,
                               encoder_ffn_dim=128, decoder_ffn_dim=128),
        adaptor_conf=dict(k=2, hidden=32, llm_dim=16),
        llm_conf=dict(dim=16, heads=2, ffn=32, layers=2),
    )
    qa.init_params(jax.random.PRNGKey(0), n_frames=50)
    feats = jnp.asarray(rng.standard_normal((1, 80, 100)), jnp.float32)
    toks, lens = qa.generate(feats)
    assert toks.shape[0] == 1
    assert np.asarray(toks).max() < 16
    text = jnp.array([[3, 4, 5]], jnp.int32)
    tlens = jnp.array([3], jnp.int32)
    loss, stats = qa.loss(qa.lm_params, feats, text, tlens)
    assert np.isfinite(float(loss))

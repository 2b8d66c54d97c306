"""Whisper log-mel frontend: golden test vs transformers'
WhisperFeatureExtractor."""

import numpy as np
import jax.numpy as jnp
import pytest

from funasr_tpu.frontends.whisper_frontend import (
    WhisperFrontend,
    log_mel_spectrogram,
)


def test_log_mel_matches_hf_extractor(rng):
    from transformers import WhisperFeatureExtractor

    fe = WhisperFeatureExtractor(feature_size=80)
    wav = (0.1 * np.sin(2 * np.pi * 440 * np.arange(16000) / 16000)
           + 0.01 * rng.standard_normal(16000)).astype(np.float32)
    ref = fe(wav, sampling_rate=16000, return_tensors="np",
             padding="max_length").input_features[0]  # (80, 3000)
    ours = np.asarray(WhisperFrontend(n_mels=80)(wav)[0])
    assert ours.shape == ref.shape == (80, 3000)
    # compare the non-padded region
    T = 16000 // 160
    np.testing.assert_allclose(ours[:, :T], ref[:, :T], atol=5e-3)


def test_log_mel_shapes(rng):
    wav = jnp.asarray(rng.standard_normal((2, 4800)), jnp.float32)
    out = log_mel_spectrogram(wav, n_mels=128)
    assert out.shape == (2, 128, 30)
    assert np.isfinite(np.asarray(out)).all()

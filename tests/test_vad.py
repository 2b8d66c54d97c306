"""FSMN-VAD: scorer shapes, streaming-cache equivalence, state machine
table tests on synthetic score patterns."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from funasr_tpu.models.fsmn_vad.encoder import FSMN
from funasr_tpu.models.fsmn_vad.model import (
    VADXOptions,
    VadStateMachine,
    WindowDetector,
    compute_decibel,
    FsmnVADStreaming,
)

ENC = dict(input_dim=32, input_affine_dim=24, fsmn_layers=2, linear_dim=24,
           proj_dim=16, lorder=5, rorder=0, lstride=1, rstride=1,
           output_affine_dim=24, output_dim=4)


def test_fsmn_scorer_shapes(rng):
    m = FSMN(**ENC)
    x = jnp.asarray(rng.standard_normal((2, 30, 32)), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    assert y.shape == (2, 30, 4)
    np.testing.assert_allclose(np.asarray(y).sum(-1), 1.0, rtol=1e-5)


def test_fsmn_streaming_cache_equivalence(rng):
    """Chunked scoring with cache == full-utterance scoring (causal net)."""
    m = FSMN(**ENC)
    x = jnp.asarray(rng.standard_normal((1, 24, 32)), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)
    full = np.asarray(m.apply(params, x))

    cache = m.init_cache(1)
    outs = []
    for i in range(0, 24, 8):
        y, cache = m.apply(params, x[:, i:i + 8], cache)
        outs.append(np.asarray(y))
    chunked = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(chunked, full, rtol=1e-5, atol=1e-6)


def test_window_detector_transitions():
    w = WindowDetector(200, 150, 150, 10)  # 20-frame window, 15-count thres
    # feed 14 speech frames: stays sil
    for _ in range(14):
        assert w.detect(1) in ("sil2sil",)
    # 15th speech frame crosses
    assert w.detect(1) == "sil2speech"
    assert w.detect(1) == "speech2speech"
    # decay below 15 -> speech2sil (win fills with 0s; sum<=15 immediately
    # since sum was exactly 15 when the next frame is silence... add zeros)
    out = [w.detect(0) for _ in range(6)]
    assert "speech2sil" in out


def _run_machine(sil_probs, db=None, opts=None, final=True):
    opts = opts or VADXOptions()
    sm = VadStateMachine(opts)
    sil_probs = np.asarray(sil_probs, np.float64)
    if db is None:
        db = np.full(len(sil_probs), -20.0)
    sm.feed(sil_probs, db, is_final=final)
    return sm.pop_segments(streaming=False), sm


def test_state_machine_basic_segment():
    # 1s silence, 2s speech, 1.5s silence (10ms frames)
    sil = np.concatenate([
        np.full(100, 0.99), np.full(200, 0.01), np.full(150, 0.99)
    ])
    segs, _ = _run_machine(sil)
    assert len(segs) == 1
    start, end = segs[0]
    # speech starts at frame 100 -> detection fires ~frame 115, lookback 40
    assert 600 <= start <= 1100
    # end: speech ends at 3000ms; max_end_silence 800 - 150 = 650ms after,
    # minus lookahead extension
    assert 2900 <= end <= 3700


def test_state_machine_all_silence_final_fake_segment():
    sil = np.full(300, 0.99)
    segs, sm = _run_machine(sil)
    # reference emits a fake zero-length [0, 10] segment on final silence
    assert len(segs) <= 1
    if segs:
        assert segs[0][1] - segs[0][0] <= 20


def test_state_machine_two_segments():
    sil = np.concatenate([
        np.full(50, 0.99), np.full(150, 0.01), np.full(150, 0.99),
        np.full(150, 0.01), np.full(100, 0.99),
    ])
    segs, _ = _run_machine(sil)
    assert len(segs) == 2
    assert segs[0][1] <= segs[1][0]


def test_state_machine_streaming_partials():
    opts = VADXOptions()
    sm = VadStateMachine(opts)
    db = np.full(100, -20.0)
    sm.feed(np.full(100, 0.01), db, is_final=False)  # 1s speech, not final
    partial = sm.pop_segments(streaming=True)
    assert partial and partial[0][1] == -1  # [beg, -1]
    sm.feed(np.full(100, 0.99), db, is_final=True)  # silence to end
    final = sm.pop_segments(streaming=True)
    assert final and final[-1][1] > 0
    assert final[-1][0] == -1  # continuation partial [-1, end]


def test_max_single_segment_split():
    opts = VADXOptions(max_single_segment_time=1000)  # 1s cap
    sil = np.concatenate([np.full(300, 0.01), np.full(100, 0.99)])
    segs, _ = _run_machine(sil, opts=opts)
    assert len(segs) >= 2  # split by the cap


def test_compute_decibel():
    w = np.concatenate([np.zeros(8000), 0.5 * np.ones(8000)])
    db = compute_decibel(w)
    assert db.shape[0] == (16000 - 400) // 160 + 1
    assert db[0] < db[-1]


def test_vad_model_offline(rng):
    model = FsmnVADStreaming(encoder_conf=ENC, speech_noise_thres=0.6)
    model.init_params(jax.random.PRNGKey(0), 32)
    feats = jnp.asarray(rng.standard_normal((1, 60, 32)), jnp.float32)
    wav = rng.standard_normal(60 * 160 + 240).astype(np.float32) * 0.1
    segs = model.segments_offline(feats, wav)
    assert isinstance(segs, list)  # random weights: any or no segments


def test_frame_decibel_device_matches_host():
    from funasr_tpu.models.fsmn_vad.model import (compute_decibel,
                                                  frame_decibel_device)

    rng = np.random.default_rng(0)
    w = (0.3 * np.sin(2 * np.pi * 220 * np.arange(16000) / 16000)
         + 0.01 * rng.standard_normal(16000)).astype(np.float32)
    host = compute_decibel(w)
    dev = np.asarray(frame_decibel_device(jnp.asarray(w[None, :])))[0]
    assert dev.shape == host.shape
    np.testing.assert_allclose(dev, host, atol=1e-3)

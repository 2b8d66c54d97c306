"""Native C++ VAD state machine == Python implementation, segment for
segment, across chunked streaming feeds and offline pops."""

import numpy as np
import pytest

from funasr_tpu.models.fsmn_vad.model import VADXOptions, VadStateMachine
from funasr_tpu.runtime import native_vad

pytestmark = pytest.mark.skipif(not native_vad.is_available(),
                                reason="no C++ toolchain")


def _signals(rng, n_frames):
    """Synthetic silence posteriors + decibels with speech bursts."""
    sil = np.full(n_frames, 0.95)
    db = np.full(n_frames, -60.0) + rng.standard_normal(n_frames)
    t = 0
    while t < n_frames - 50:
        t += int(rng.integers(40, 120))
        dur = min(int(rng.integers(30, 200)), n_frames - t)
        if dur <= 0:
            break
        sil[t: t + dur] = 0.05 + 0.1 * rng.random(dur)
        db[t: t + dur] = -20.0 + rng.standard_normal(dur)
        t += dur
    return sil, db


@pytest.mark.parametrize("streaming", [True, False])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_native_matches_python(streaming, seed):
    rng = np.random.default_rng(seed)
    n = 3000  # 30 s at 10 ms frames
    sil, db = _signals(rng, n)
    opts = VADXOptions()

    py = VadStateMachine(opts)
    cc = native_vad.NativeVadStateMachine(opts)

    got_py, got_cc = [], []
    pos = 0
    while pos < n:
        step = int(rng.integers(5, 80))
        end = min(pos + step, n)
        final = end == n
        py.feed(sil[pos:end], db[pos:end], is_final=final)
        cc.feed(sil[pos:end], db[pos:end], is_final=final)
        got_py.extend(py.pop_segments(streaming=streaming))
        got_cc.extend(cc.pop_segments(streaming=streaming))
        pos = end

    assert got_cc == got_py
    if not streaming:
        assert got_py, "no segments detected — test signal too quiet"
        assert all(a < b for a, b in got_py)


def test_native_single_utterance_mode():
    """detect_mode=0 with long leading silence emits the fake segment."""
    opts = VADXOptions(detect_mode=0, max_start_silence_time=500)
    py = VadStateMachine(opts)
    cc = native_vad.NativeVadStateMachine(opts)
    sil = np.full(200, 0.99)
    db = np.full(200, -70.0)
    py.feed(sil, db, is_final=True)
    cc.feed(sil, db, is_final=True)
    assert cc.pop_segments(False) == py.pop_segments(False)


@pytest.mark.parametrize("seed", [0, 3])
def test_native_matches_python_raised_decibel_thres(seed):
    """Sub-decibel-threshold frames advance the sliding window twice
    (reference GetFrameState quirk, model.py:500) — native and Python must
    agree when decibel_thres actually bites."""
    rng = np.random.default_rng(seed)
    n = 2000
    sil, db = _signals(rng, n)
    opts = VADXOptions(decibel_thres=-40.0)  # quiet frames fall below

    py = VadStateMachine(opts)
    cc = native_vad.NativeVadStateMachine(opts)
    py.feed(sil, db, is_final=True)
    cc.feed(sil, db, is_final=True)
    got_py = py.pop_segments(streaming=False)
    got_cc = cc.pop_segments(streaming=False)
    assert got_cc == got_py
    assert got_py  # bursts at -20 dB still detected

"""Dynamic batching scheduler (funasr_tpu/runtime/batcher.py).

The reference has no unit tests for its server concurrency; these cover the
TPU batcher's contract: coalescing, order-preserving scatter, homogeneous
option grouping, error propagation, and the AutoModel facade used by the
websocket/http/grpc servers.
"""

import threading
import time
from concurrent.futures import wait

import numpy as np
import pytest

from funasr_tpu.runtime.batcher import BatchingAutoModel, DynamicBatcher


def slow_upper(items, **kwargs):
    time.sleep(0.02)  # emulate a device batch: same cost for 1 or N items
    suffix = kwargs.get("suffix", "")
    return [str(x).upper() + suffix for x in items]


def test_coalesces_concurrent_requests():
    with DynamicBatcher(slow_upper, max_batch=16, max_wait_ms=30) as b:
        futs = [b.submit(f"req{i}") for i in range(16)]
        wait(futs, timeout=10)
        assert [f.result() for f in futs] == [f"REQ{i}".upper()
                                              for i in range(16)]
    # all 16 arrived before the 30 ms window closed -> few large batches
    assert max(b.batch_sizes) > 1
    assert sum(b.batch_sizes) == 16


def test_results_map_back_in_order_under_threads():
    with DynamicBatcher(slow_upper, max_batch=8, max_wait_ms=5) as b:
        results = {}

        def client(i):
            results[i] = b.submit(f"x{i}").result(timeout=10)

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(24)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    assert results == {i: f"X{i}" for i in range(24)}


def test_kwargs_groups_are_not_mixed():
    seen = []

    def record(items, **kw):
        seen.append((len(items), kw.get("suffix", "")))
        return [str(x) + kw.get("suffix", "") for x in items]

    with DynamicBatcher(record, max_batch=8, max_wait_ms=40) as b:
        fa = [b.submit(i, suffix="!") for i in range(3)]
        fb = [b.submit(i, suffix="?") for i in range(3)]
        assert [f.result(timeout=10) for f in fa] == ["0!", "1!", "2!"]
        assert [f.result(timeout=10) for f in fb] == ["0?", "1?", "2?"]
    for _, sfx in seen:
        assert sfx in ("!", "?")  # each executed batch is homogeneous


def test_error_propagates_to_all_waiters():
    def boom(items, **kw):
        raise ValueError("device on fire")

    with DynamicBatcher(boom, max_batch=4, max_wait_ms=5) as b:
        futs = [b.submit(i) for i in range(4)]
        for f in futs:
            with pytest.raises(ValueError, match="device on fire"):
                f.result(timeout=10)
    # the worker survives an erroring batch
    with DynamicBatcher(slow_upper, max_batch=4, max_wait_ms=5) as b2:
        assert b2.submit("ok").result(timeout=10) == "OK"


def test_max_batch_cap():
    def record(items, **kw):
        record.sizes.append(len(items))
        return list(items)

    record.sizes = []
    with DynamicBatcher(record, max_batch=4, max_wait_ms=50) as b:
        futs = [b.submit(i) for i in range(10)]
        wait(futs, timeout=10)
    assert max(record.sizes) <= 4


def test_submit_after_close_raises():
    b = DynamicBatcher(slow_upper, max_batch=4, max_wait_ms=5)
    b.close()
    with pytest.raises(RuntimeError):
        b.submit("late")


class _FakeAutoModel:
    """generate() contract of funasr_tpu.AutoModel (one dict per wav)."""

    def __init__(self):
        self.engine = None
        self.batch_sizes = []

    def generate(self, input, batch_size=16, **kw):
        wavs = input if isinstance(input, (list, tuple)) else [input]
        self.batch_sizes.append(len(wavs))
        time.sleep(0.01)
        return [{"text": f"len{len(w)}"} for w in wavs]


def test_batching_auto_model_facade():
    am = _FakeAutoModel()
    bam = BatchingAutoModel(am, max_batch=8, max_wait_ms=30)
    try:
        outs = {}

        def client(i):
            wav = np.zeros(100 + i, np.float32)
            outs[i] = bam.generate(wav, key=[f"k{i}"])[0]

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i in range(8):
            assert outs[i]["text"] == f"len{100 + i}"
            assert outs[i]["key"] == f"k{i}"
        assert max(am.batch_sizes) > 1  # coalesced into a shared batch
    finally:
        bam.close()


def test_websocket_server_uses_batcher():
    from funasr_tpu.runtime.websocket_server import AsrWebSocketServer

    am = _FakeAutoModel()
    srv = AsrWebSocketServer(am, max_batch=8)
    assert isinstance(srv.decode_model, BatchingAutoModel)
    srv.decode_model.close()
    srv_nb = AsrWebSocketServer(am, max_batch=1)
    assert srv_nb.decode_model is am

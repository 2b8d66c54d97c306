"""Streaming per-chunk latency on one TPU chip (not the driver metric —
see bench.py; this measures the online path's steady-state chunk compute).

Paraformer-large streaming config (chunk_size [0,10,5] = 600 ms chunks,
reference paraformer_streaming/model.py:435): one jitted step per chunk
(chunked encoder with KV rings + online CIF + decoder FSMN tails).  K
steps are chained in one program (dynamic trip count) and the slope gives
per-chunk device latency; RTF = latency / 0.6 s.
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from __graft_entry__ import _flagship
    from funasr_tpu.models.paraformer_streaming.model import (
        ParaformerStreaming,
    )

    model = _flagship(dtype=jnp.bfloat16)
    T0 = 60
    x0 = jnp.zeros((1, T0, 560))
    params = jax.jit(
        lambda k, x, l: model.init({"params": k}, x, l, max_tokens=16,
                                   method=model.greedy_decode)
    )(jax.random.PRNGKey(0), x0, jnp.array([T0]))

    sm = ParaformerStreaming(params, input_size=560, d_model=512, n_head=4,
                             enc_kernel=11, dec_kernel=11, n_enc_layers=50,
                             n_dec_layers=16, chunk_size=(0, 10, 5))
    cache = sm.init_cache()
    state0 = cache.device
    window = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, sm.window, 560)),
        jnp.float32)
    p = sm.params

    @jax.jit
    def run_k(p, window, state, k):
        def body(i, carry):
            st, acc = carry
            w = window + i.astype(jnp.float32) * 1e-8
            toks, n, st = sm._step(p, w, st, jnp.zeros(()),
                       jnp.asarray(sm.window, jnp.int32))
            return st, acc + jnp.sum(toks) + jnp.sum(n)
        _, acc = jax.lax.fori_loop(0, k, body, (state, jnp.zeros((), jnp.int32)))
        return acc

    def _t(f):
        t0 = time.time()
        f()
        return time.time() - t0

    k1 = jnp.asarray(1, jnp.int32)
    kN = jnp.asarray(21, jnp.int32)
    t0 = time.time()
    np.asarray(run_k(p, window, state0, k1))
    np.asarray(run_k(p, window, state0, kN))
    compile_s = time.time() - t0
    t1 = min(_t(lambda: np.asarray(run_k(p, window, state0, k1)))
             for _ in range(3))
    tN = min(_t(lambda: np.asarray(run_k(p, window, state0, kN)))
             for _ in range(3))
    per_chunk = max(tN - t1, 1e-9) / 20
    print(json.dumps({
        "metric": "streaming_chunk_latency_ms",
        "value": round(per_chunk * 1000, 2),
        "unit": "ms/600ms-chunk",
        "rtf": round(per_chunk / 0.6, 4),
        "detail": {"model": "paraformer-large-arch", "chunk_ms": 600,
                   "compile_s": round(compile_s, 1)},
    }))


if __name__ == "__main__":
    main()

"""Hybrid CTC/attention BEAM decode bench (the WFST-replacement path).

Standalone version of bench_pipeline.py's hybrid-beam column so the beam
path can be iterated without paying the 15-minute pipeline bench: the
full-size conformer_hybrid.yaml model (12x256 Conformer encoder, 6-layer
Transformer decoder, vocab 4233) decodes B=8 x 15 s utterances with
beam=10, maxlen=96, joint CTC 0.3, int8 serving quant — identical knobs
to the pipeline column.

Timing: the axon tunnel makes block_until_ready a no-op, so K decode
iterations are chained inside ONE jitted program (inputs perturbed per
iteration) and the K=1 -> K=3 slope is used, as everywhere else in the
repo's benches.

Prints one JSON line: {"metric": "hybrid_beam_audio_seconds_per_s", ...}.
Reference baselines: the A10 libtorch single-stream pipeline RTF 0.0076
(131 audio-s/s) and the 32-thread Xeon ONNX offline server RTF 0.00178
(562 audio-s/s) — BASELINE.md.
"""

import functools
import json
import os
import sys
import time

import numpy as np

# serving beam config: per-row int8 self-attn KV cache (the AR step's
# bandwidth lever — ops/cached_decoder.int8_kv_enabled).  Restores batch
# scaling: r5 A/B per_batch 8/16/32 = 1907/1831/1933 audio-s/s with it
# vs 1908/1603/1431 without (the bf16 cache is bandwidth-bound in N).
# FUNASR_TPU_INT8_KV=0 opts out.  Token effect bounded like the int8
# matmuls (tests/test_beam_search.py::test_int8_kv_cache_beam_close_to_bf16).
os.environ.setdefault("FUNASR_TPU_INT8_KV", "1")

import funasr_tpu  # noqa: F401  (re-applies JAX_PLATFORMS)
import jax
import jax.numpy as jnp

from funasr_tpu.auto.auto_model import AutoModel
from funasr_tpu.config import load_config

FS = 16000
UTT_S = 15
TINY = "--tiny" in sys.argv
CTC0 = "--ctc0" in sys.argv  # isolate the attention/beam path cost


def main():
    cfg = load_config("configs/conformer_hybrid.yaml")
    cfg["tokenizer_conf"] = {
        "token_list": ["<blank>", "<s>", "</s>"]
        + [f"字{i}" for i in range(cfg["vocab_size"] - 3)]}
    if TINY:
        cfg["encoder_conf"].update(num_blocks=2, output_size=32,
                                   linear_units=64, attention_heads=2)
        cfg["decoder_conf"] = dict(cfg.get("decoder_conf") or {},
                                   num_blocks=1, linear_units=64,
                                   attention_heads=2)
    t0 = time.perf_counter()
    am = AutoModel(model=cfg, quantize=True)
    be = am.engine
    # AutoModel flips the int8 flag only inside generate(); this bench
    # traces the beam program directly, so mirror the serving config
    # (trace-time flag — CLAUDE.md quant trap, same as bench_pipeline)
    from funasr_tpu.ops import quant

    quant.enable(True)
    build_s = time.perf_counter() - t0

    T = FS * (2 if TINY else UTT_S)
    maxlen = 16 if TINY else 96

    @functools.partial(jax.jit, static_argnames=())
    def beam_k(params, w, l, k):
        def body(i, acc):
            feats, flens = be.frontend.device_features(
                w + i.astype(jnp.float32) * 1e-8, l)
            toks, tls, sc = be.module.apply(
                params, feats, flens, beam=10, maxlen=maxlen,
                decoding_ctc_weight=0.0 if CTC0 else 0.3,
                method=be.module.decode_beam)
            return acc + jnp.sum(tls[:, 0])
        return jax.lax.fori_loop(0, k, body, jnp.zeros((), jnp.int32))

    def measure(B):
        wav = jnp.asarray(
            0.1 * np.sin(2 * np.pi * 260 * np.arange(T) / FS)[None, :]
            .repeat(B, 0).astype(np.float32))
        lens = jnp.asarray(np.full((B,), T, np.int32))
        t0 = time.perf_counter()
        np.asarray(beam_k(be.params, wav, lens, 1))
        compile_s = time.perf_counter() - t0

        def run(k):
            t0 = time.perf_counter()
            np.asarray(beam_k(be.params, wav, lens, k))
            return time.perf_counter() - t0

        run(1)
        t1 = min(run(1), run(1))
        t3 = min(run(3), run(3))
        t_beam = (t3 - t1) / 2
        return B * (T / FS) / t_beam, t_beam, compile_s

    # B=8 = the pipeline column's per-VAD-segment batch; B=32 = the
    # saturated serving batch (the single-chip analogue of the
    # reference's 32-thread CPU server concurrency); B=64 re-entered the
    # sweep once candidate-space selection removed the B-scaling
    # (B, K*V) top_k that made it re-invert in r4
    sizes = (2,) if TINY else (8, 16, 32, 64)
    rows = {B: measure(B) for B in sizes}
    # headline = the best operating point (after the r5 top_k fix the
    # step is KV-cache-bandwidth-bound: per-utterance cost grows mildly
    # with N = B*beam, so B=8 wins on rate AND latency)
    B_head = max(rows, key=lambda b: rows[b][0])
    rate, t_beam, compile_s = rows[B_head]
    out = {
        "metric": "hybrid_beam_audio_seconds_per_s",
        "value": round(rate, 1),
        "unit": "audio-s/s",
        "vs_baseline": round(rate / 131.0, 1),
        "detail": {
            "batch": B_head, "utt_seconds": T / FS, "beam": 10,
            "maxlen": maxlen, "ctc_weight": 0.0 if CTC0 else 0.3,
            "batch_latency_ms": round(1e3 * t_beam, 1),
            "compile_s": round(compile_s, 1),
            "build_s": round(build_s, 1),
            "per_batch": {str(B): {"audio_s_per_s": round(r, 1),
                                   "latency_ms": round(1e3 * t, 1)}
                          for B, (r, t, _) in rows.items()},
            "int8_kv_cache": os.environ.get("FUNASR_TPU_INT8_KV") == "1",
            "vs_xeon32_onnx_server": round(rate / 562.0, 1),
            "note": "random weights; slope-timed K=1 vs K=3",
        },
    }
    if not TINY and not CTC0:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_BEAM.json"), "w") as f:
            json.dump(out, f)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

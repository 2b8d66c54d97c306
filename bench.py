"""Benchmark: offline batch ASR throughput on one TPU chip.

Runs the flagship Paraformer-large architecture (template.yaml config,
bfloat16, random weights — accuracy is tested elsewhere; this measures the
compute path) over a realistic offline batch: frontend (fbank+LFR+CMVN) +
encoder + CIF + decoder + greedy decode, end to end on device.

Prints ONE JSON line: audio-seconds per second per chip (1/RTF).
Baseline: reference GPU pipeline single-stream RTF 0.0076 on an NVIDIA A10
(runtime/docs/benchmark_libtorch_cpp.md:24-31) -> 131.6 audio-s/s.
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")

import jax

# Persistent compilation cache: the flagship program compiles in ~2-8 min
# through the remote tunnel; cache hits bring reruns down to seconds.
# persistent cache only on the accelerator: XLA:CPU AOT entries pin
# host machine features and SIGILL after a sandbox host migration
# (observed r5 — a stale cache segfaulted CPU compiles suite-wide)
if "cpu" not in (os.environ.get("JAX_PLATFORMS") or ""):
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

BASELINE_AUDIO_S_PER_S = 1.0 / 0.0076  # A10 single-stream pipeline (131.6)


def _timed(fn):
    t0 = time.time()
    fn()
    return time.time() - t0


def main():
    from funasr_tpu.ops import fbank as F
    from funasr_tpu.ops import quant
    from __graft_entry__ import _flagship

    # int8 dynamic quantization (ops/quant.py + ops/ffn_pallas.py): default
    # on, mirroring the reference serving default (funasr-wss-server.cpp:54
    # "--quantize true (Default)").  Accuracy of OUR int8 path is measured
    # by bench_int8_accuracy.py: 99.65% greedy token agreement vs bf16 at
    # flagship shape (BENCH_INT8_ACCURACY.json).  FUNASR_TPU_INT8=0 opts out.
    use_int8 = os.environ.get("FUNASR_TPU_INT8", "1") == "1"
    quant.enable(use_int8)

    model = _flagship(dtype=jnp.bfloat16)

    # Offline batch: 64 utterances x 15 s (AISHELL-style offline decoding
    # with batched segments).
    B, secs, fs = 64, 15, 16000
    N = secs * fs
    rng = np.random.default_rng(0)
    wav = (0.1 * np.sin(2 * np.pi * 300 * np.arange(N) / fs)[None, :]
           + 0.02 * rng.standard_normal((B, N))).astype(np.float32)
    lengths = np.full((B,), N, np.int64)
    lengths[1::2] = int(N * 0.8)  # some padding, like real batches
    wav_d = jnp.asarray(wav)
    len_d = jnp.asarray(lengths, jnp.int32)
    cmvn = jnp.stack([jnp.zeros(560, jnp.float32), jnp.ones(560, jnp.float32)])

    # Token budget: the production engine allots 128 tokens per 15 s
    # (auto/engines.py max_tokens_per_15s=128, ~2x the realistic Mandarin
    # char rate) — the decoder grid matches what serving actually runs.
    max_tokens = 128

    from funasr_tpu.ops.fbank_pallas import fbank_pallas

    def pipeline(params, wav, lens, cmvn):
        feats, flens = fbank_pallas(wav, lens)
        lfr, lfr_lens = F.apply_lfr(feats, flens, 7, 6)
        x = F.apply_cmvn(lfr, cmvn)
        # 128-aligned frame axis: clean MXU tiling + the fused Pallas
        # attention path (ops/attention_pallas.py)
        x = F.pad_frames(x, 128)
        return model.apply(params, x, lfr_lens, max_tokens=max_tokens,
                           method=model.greedy_decode)

    t0 = time.time()
    feats, flens = F.fbank(wav_d[:1], len_d[:1], dither=0.0)
    lfr, lfr_lens = F.apply_lfr(feats, flens, 7, 6)
    x0 = F.apply_cmvn(lfr, cmvn)
    key = jax.random.PRNGKey(0)
    # init under jit: one compiled program instead of thousands of eager
    # dispatches through the device tunnel
    params = jax.jit(
        lambda k, x, l: model.init({"params": k}, x, l, max_tokens=max_tokens,
                                   method=model.greedy_decode)
    )(key, x0, lfr_lens)
    init_s = time.time() - t0

    # Timing methodology: the device tunnel in this sandbox makes
    # block_until_ready unreliable and host round-trips expensive, so we
    # chain K pipeline iterations inside ONE jitted program (input perturbed
    # per iteration so XLA cannot hoist the body) and take the slope
    # between K=1 and K=1+ITERS — per-call overhead cancels.
    @jax.jit
    def bench_k(params, wav, lens, cmvn, k):
        # k is a traced scalar -> ONE compiled program (a while loop)
        # serves both the k=1 and k=1+iters timings; halves compile time
        # through the remote-tunnel compiler.
        def body(i, acc):
            w = wav + i.astype(jnp.float32) * 1e-8
            tokens, tok_lens, _ = pipeline(params, w, lens, cmvn)
            return acc + jnp.sum(tokens) + jnp.sum(tok_lens)
        return jax.lax.fori_loop(0, k, body, jnp.zeros((), jnp.int32))

    iters = 5
    k1 = jnp.asarray(1, jnp.int32)
    k6 = jnp.asarray(1 + iters, jnp.int32)
    t0 = time.time()
    _ = np.asarray(bench_k(params, wav_d, len_d, cmvn, k1))
    _ = np.asarray(bench_k(params, wav_d, len_d, cmvn, k6))
    compile_s = time.time() - t0

    t1 = min(
        _timed(lambda: np.asarray(bench_k(params, wav_d, len_d, cmvn, k1)))
        for _ in range(3)
    )
    t6 = min(
        _timed(lambda: np.asarray(bench_k(params, wav_d, len_d, cmvn, k6)))
        for _ in range(3)
    )
    dt = max(t6 - t1, 1e-9) / iters

    audio_seconds = float(lengths.sum()) / fs
    value = audio_seconds / dt
    print(json.dumps({
        "metric": "offline_batch_audio_seconds_per_s_per_chip",
        "value": round(value, 1),
        "unit": "audio-s/s",
        "vs_baseline": round(value / BASELINE_AUDIO_S_PER_S, 2),
        "detail": {
            "batch": B, "utt_seconds": secs,
            "dtype": "bfloat16+int8" if use_int8 else "bfloat16",
            "model": "paraformer-large-arch(220M)",
            "batch_latency_ms": round(dt * 1000, 1),
            "compile_s": round(compile_s, 1),
            "init_s": round(init_s, 1),
            "baseline": "A10 libtorch pipeline single-stream RTF 0.0076",
        },
    }))


if __name__ == "__main__":
    main()

"""Whisper-large-v3 single-chip bench (SURVEY §7.11 north star).

Full large-v3 architecture (32+32 layers, d_model 1280, 128 mels, vocab
51866; ~1.5B params) in bf16, random init: KV-cached greedy decode of
B x 30 s log-mel windows, slope-timed (K-chained, axon tunnel rules).
Multi-chip sharding of the same model is certified separately by
__graft_entry__.dryrun_multichip's tensor-parallel check (token-exact on
an 8-device mesh with attention/FFN sharded over `model`).

Prints one JSON line {"metric": "whisper_large_v3_tokens_per_s", ...}.
"""

import json
import sys
import time

import numpy as np

import funasr_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from funasr_tpu.models.whisper.model import WhisperWrap

TINY = "--tiny" in sys.argv


def main():
    size = "tiny" if TINY else "large-v3"
    B = 2 if TINY else 8
    max_tokens = 8 if TINY else 64
    t0 = time.perf_counter()
    overrides = dict(config_overrides=dict(max_source_positions=100)) \
        if TINY else {}
    w = WhisperWrap(size=size, dtype=jnp.bfloat16, **overrides)
    build_s = time.perf_counter() - t0
    n_mels = getattr(w.config, "num_mel_bins", 80)
    rng = np.random.default_rng(0)
    frames = 2 * getattr(w.config, "max_source_positions", 1500)
    feats = jnp.asarray(rng.standard_normal((B, n_mels, frames)) * 0.3,
                        jnp.float32)

    sot = w.config.decoder_start_token_id

    @jax.jit
    def gen_k(params, feats, k):
        def body(i, acc):
            f = feats + i.astype(jnp.float32) * 1e-8
            enc = w.model.encode(input_features=f, params=params)
            cache = w.model.init_cache(B, 1 + max_tokens, enc)

            def step(carry, j):
                tok, cache = carry
                o = w.model.decode(
                    decoder_input_ids=tok[:, None], encoder_outputs=enc,
                    params=params, past_key_values=cache,
                    decoder_position_ids=jnp.full((B, 1), j, jnp.int32))
                pred = jnp.argmax(o.logits[:, -1, :], -1).astype(jnp.int32)
                return (pred, o.past_key_values), pred

            (_, _), preds = jax.lax.scan(
                step, (jnp.full((B,), sot, jnp.int32), cache),
                jnp.arange(max_tokens))
            return acc + jnp.sum(preds[-1])
        return jax.lax.fori_loop(0, k, body, jnp.zeros((), jnp.int32))

    t0 = time.perf_counter()
    np.asarray(gen_k(w.params, feats, 1))
    compile_s = time.perf_counter() - t0

    def run(k):
        t0 = time.perf_counter()
        np.asarray(gen_k(w.params, feats, k))
        return time.perf_counter() - t0

    run(1)
    t1 = min(run(1), run(1))
    t3 = min(run(3), run(3))
    t_batch = (t3 - t1) / 2
    tok_s = B * max_tokens / t_batch
    audio_s = B * (30.0 if not TINY else 2.0) / t_batch
    print(json.dumps({
        "metric": "whisper_large_v3_tokens_per_s" if not TINY
        else "whisper_tiny_tokens_per_s",
        "value": round(tok_s, 1),
        "unit": "tokens/s",
        "vs_baseline": None,
        "detail": {
            "size": size, "batch": B, "max_tokens": max_tokens,
            "dtype": "bfloat16", "batch_latency_ms": round(1e3 * t_batch, 1),
            "audio_s_per_s_at_64tok_per_30s": round(audio_s, 1),
            "compile_s": round(compile_s, 1),
            "build_s": round(build_s, 1),
            "note": "random weights; KV-cached greedy, slope-timed; "
                    "multi-chip TP certified by dryrun_multichip",
        },
    }))


if __name__ == "__main__":
    main()

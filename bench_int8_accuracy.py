"""int8 serving-path accuracy on THIS stack (real chip).

The reference quotes onnxruntime int8 keeping CER at 1.95
(runtime/docs/benchmark_onnx_cpp.md:63-81); that number belongs to their
quantizer, not ours.  This measures OUR fused int8 Pallas serving path
(ops/sanm_layer_pallas.py, ops/decoder_layer_pallas.py, ops/ffn_pallas.py)
against the bf16 path on the flagship Paraformer-large architecture:

- greedy token agreement (%) over the valid token grid,
- token-length agreement,
- log-prob deltas (mean/max over valid tokens),
- top-1 vs top-2 margin flip rate (how often int8 noise could flip a
  decision: |delta| > margin).

Random weights probe the numerics of the kernels themselves — the same
layers published checkpoints run through; logit-level deltas bound the
CER drift achievable from quantization alone.

Prints ONE JSON line; writes BENCH_INT8_ACCURACY.json.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, ".")

import jax

# persistent cache only on the accelerator: XLA:CPU AOT entries pin
# host machine features and SIGILL after a sandbox host migration
# (observed r5 — a stale cache segfaulted CPU compiles suite-wide)
if "cpu" not in (os.environ.get("JAX_PLATFORMS") or ""):
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np


def main():
    from funasr_tpu.ops import fbank as F
    from funasr_tpu.ops import quant
    from funasr_tpu.ops.fbank_pallas import fbank_pallas
    from __graft_entry__ import _flagship

    model = _flagship(dtype=jnp.bfloat16)

    B, secs, fs = 16, 15, 16000
    N = secs * fs
    rng = np.random.default_rng(1)
    wav = (0.1 * np.sin(2 * np.pi * 300 * np.arange(N) / fs)[None, :]
           + 0.02 * rng.standard_normal((B, N))).astype(np.float32)
    lengths = np.full((B,), N, np.int64)
    lengths[1::2] = int(N * 0.8)
    wav_d = jnp.asarray(wav)
    len_d = jnp.asarray(lengths, jnp.int32)
    cmvn = jnp.stack([jnp.zeros(560, jnp.float32),
                      jnp.ones(560, jnp.float32)])
    max_tokens = 128

    def features(wav, lens):
        feats, flens = fbank_pallas(wav, lens)
        lfr, lfr_lens = F.apply_lfr(feats, flens, 7, 6)
        x = F.apply_cmvn(lfr, cmvn)
        return F.pad_frames(x, 128), lfr_lens

    t0 = time.time()
    x0, l0 = features(wav_d[:1], len_d[:1])
    params = jax.jit(
        lambda k, x, l: model.init({"params": k}, x, l,
                                   max_tokens=max_tokens,
                                   method=model.inference_logits)
    )(jax.random.PRNGKey(0), x0, l0)

    # quant.enabled() is read at TRACE time, so it must be a static arg:
    # one jit cache entry per setting (re-jitting the same callable would
    # silently reuse the first trace and compare bf16 against itself)
    @functools.partial(jax.jit, static_argnames=("use_int8",))
    def logits_fn(params, wav, lens, use_int8):
        with quant.quantized(use_int8):
            x, xl = features(wav, lens)
            return model.apply(params, x, xl, max_tokens=max_tokens,
                               method=model.inference_logits)

    # bf16 reference pass
    lp_fp, n_fp, _ = logits_fn(params, wav_d, len_d, use_int8=False)
    lp_fp = np.asarray(lp_fp, np.float32)
    n_fp = np.asarray(n_fp)

    # int8 fused serving pass (same params, same program shape)
    lp_q, n_q, _ = logits_fn(params, wav_d, len_d, use_int8=True)
    lp_q = np.asarray(lp_q, np.float32)
    n_q = np.asarray(n_q)
    setup_s = time.time() - t0

    len_agree = bool((n_fp == n_q).all())
    tok_total = tok_same = 0
    deltas = []
    flips = 0
    margin_checked = 0
    for b in range(B):
        n = int(min(n_fp[b], n_q[b]))
        a = lp_fp[b, :n]
        q = lp_q[b, :n]
        ga, gq = a.argmax(-1), q.argmax(-1)
        tok_total += n
        tok_same += int((ga == gq).sum())
        deltas.append(np.abs(a - q))
        # margin flip: |delta at argmax| vs top1-top2 margin
        top2 = np.partition(a, -2, axis=-1)[:, -2]
        margin = a.max(-1) - top2
        d_at = np.abs(a[np.arange(n), ga] - q[np.arange(n), ga])
        flips += int((d_at > margin).sum())
        margin_checked += n
    deltas = np.concatenate([d.ravel() for d in deltas])
    if float(deltas.max()) == 0.0:
        raise RuntimeError(
            "int8 and bf16 logits are bit-identical — the int8 program "
            "was not actually traced (stale jit cache?); measurement void")

    agree = 100.0 * tok_same / max(tok_total, 1)
    out = {
        "metric": "int8_greedy_token_agreement_pct",
        "value": round(agree, 3),
        "unit": "%",
        "vs_baseline": round(agree / 100.0, 4),
        "detail": {
            "model": "paraformer-large-arch(220M), int8 fused Pallas "
                     "serving path vs bf16",
            "tokens_compared": int(tok_total),
            "token_length_agreement": len_agree,
            "logprob_delta_mean": float(np.mean(deltas)),
            "logprob_delta_p99": float(np.percentile(deltas, 99)),
            "logprob_delta_max": float(np.max(deltas)),
            "margin_flip_rate_pct": round(100.0 * flips
                                          / max(margin_checked, 1), 3),
            "batch": B, "utt_seconds": secs,
            "setup_s": round(setup_s, 1),
            "note": "bounds CER drift from quantization alone; the "
                    "reference's onnx int8 CER 1.95 figure is theirs, "
                    "not ours",
        },
    }
    print(json.dumps(out))
    with open("BENCH_INT8_ACCURACY.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()

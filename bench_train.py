"""BENCH_TRAIN: flagship Paraformer-large training throughput on one TPU
chip (VERDICT r4 item 3 — the training half was feature-complete but
perf-unproven).

What runs: the REAL jitted train step (train/train_step.make_train_step:
fwd + bwd + grad-accum scan + global-norm clip + non-finite skip + adamw
update) on the Paraformer-large architecture (220M params, the
__graft_entry__._flagship config), bf16 compute / fp32 params, at a
64 x 15 s-equivalent global batch (micro-batch 32 x accum 2; the
reference AISHELL paraformer recipe trains with accum_grad at a
64-equivalent batch).

Timing: same K-slope discipline as bench.py (chain K train steps inside
one jitted fori_loop carrying TrainState; the per-iteration input is
perturbed so XLA cannot hoist; block_until_ready is a no-op through the
axon tunnel).  MFU = model FLOPs per step / (step_time x 190 TFLOPs
bf16, the chip calibration from bench.py).

Model-FLOP estimate (matmul 2*MACs, B=64 eq, T=256 LFR frames, U=48):
encoder 50 SANM blocks x 111.7 GFLOP-class contraction structure
(docs/ROOFLINE.md) at bf16 ~ 4.4 TFLOP fwd; decoder 16 blocks ~ 1.0
TFLOP; predictor/embed/output ~ 0.2 -> ~5.6 TFLOP forward, x3 for
fwd+bwd = ~16.8 TFLOP per global step.

Prints ONE JSON line and writes BENCH_TRAIN.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

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
import optax

TINY = "--tiny" in sys.argv


def _arg(name, default):
    for a in sys.argv:
        if a.startswith(f"--{name}="):
            return int(a.split("=")[1])
    return default


# defaults A/B'd on-chip: 32x2 (579 ms/step, 1,657 audio-s/s) edges
# 16x4 (589 ms, 1,629); both are the same 64 x 15 s global batch
MICRO_B = 2 if TINY else _arg("micro", 32)
ACCUM = 2 if TINY else _arg("accum", 2)
UTT_S = 15
T_LFR = 32 if TINY else 256     # 15 s -> 250 LFR6 frames, padded 256
U = 8 if TINY else 48           # label length (AISHELL ~3.2 char/s)
PEAK_TFLOPS = 190.0             # bench.py chip calibration
FWD_TFLOP = 5.6 * (MICRO_B * ACCUM) / 64.0  # scaled model-FLOP estimate


def _timed(fn):
    t0 = time.time()
    fn()
    return time.time() - t0


def slope(call, k_small=1, k_big=4, reps=3):
    t1 = min(_timed(lambda: call(k_small)) for _ in range(reps))
    t2 = min(_timed(lambda: call(k_big)) for _ in range(reps))
    return max(t2 - t1, 1e-9) / (k_big - k_small)


def main():
    from funasr_tpu.train.train_step import (TrainState, create_train_state,
                                             make_train_step)

    t_all = time.time()
    if TINY:
        from funasr_tpu.models.paraformer.model import Paraformer

        model = Paraformer(
            vocab_size=128, input_size=24,
            encoder_conf=dict(output_size=32, attention_heads=2,
                              linear_units=64, num_blocks=3,
                              kernel_size=5),
            decoder_conf=dict(attention_heads=2, linear_units=64,
                              num_blocks=2, att_layer_num=2,
                              kernel_size=5),
            predictor_conf=dict(idim=32, tail_threshold=0.45),
            sampling_ratio=0.75)
        feat_dim, vocab = 24, 128
    else:
        # _flagship config + encoder remat: without rematerialisation the
        # 50-block backward stores ~25 GB of activations at B=16 x 256
        # frames (ResourceExhausted on the 16 GB chip); remat trades ~1/3
        # more encoder FLOPs for per-layer-boundary storage
        from funasr_tpu.models.paraformer.model import Paraformer

        model = Paraformer(
            vocab_size=8404, input_size=560,
            encoder_conf=dict(
                output_size=512, attention_heads=4, linear_units=2048,
                num_blocks=50, dropout_rate=0.1,
                attention_dropout_rate=0.1, kernel_size=11, sanm_shfit=0,
                remat=True),
            decoder_conf=dict(
                attention_heads=4, linear_units=2048, num_blocks=16,
                att_layer_num=16, kernel_size=11, sanm_shfit=0,
                dropout_rate=0.1, self_attention_dropout_rate=0.1,
                src_attention_dropout_rate=0.1),
            predictor_conf=dict(idim=512, threshold=1.0, l_order=1,
                                r_order=1, tail_threshold=0.45),
            lsm_weight=0.1, length_normalized_loss=True,
            predictor_weight=1.0, predictor_bias=1, sampling_ratio=0.75,
            dtype=jnp.bfloat16)
        feat_dim, vocab = 560, 8404

    rng = np.random.default_rng(0)
    speech = jnp.asarray(rng.standard_normal(
        (ACCUM, MICRO_B, T_LFR, feat_dim)).astype(np.float32))
    slens = jnp.asarray(np.full((ACCUM, MICRO_B), T_LFR - 6), jnp.int32)
    text = jnp.asarray(rng.integers(3, vocab, (ACCUM, MICRO_B, U)),
                       jnp.int32)
    tlens = jnp.asarray(np.full((ACCUM, MICRO_B), U), jnp.int32)
    batch = {"speech": speech, "speech_lengths": slens, "text": text,
             "text_lengths": tlens}

    key = jax.random.PRNGKey(0)
    t0 = time.time()
    params = jax.jit(lambda k, s, sl, t, tl: model.init(
        {"params": k, "dropout": k, "sampler": k}, s, sl, t, tl))(
        key, speech[0], slens[0], text[0], tlens[0])
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(params))
    init_s = time.time() - t0

    tx = optax.chain(optax.clip_by_global_norm(5.0),
                     optax.adamw(1e-4, weight_decay=1e-6))
    # state.params carries the FULL variables dict ({"params": ...}) —
    # the train_step applies it directly (same as __graft_entry__)
    state = create_train_state(params, tx)
    train_step = make_train_step(model, tx, accum_grad=ACCUM)

    @jax.jit
    def steps_k(state, batch, key, k):
        def body(i, st):
            b = dict(batch)
            b["speech"] = batch["speech"] + i.astype(jnp.float32) * 1e-8
            st2, stats = train_step(
                st, b, jax.random.fold_in(key, st.step))
            return st2
        return jax.lax.fori_loop(0, k, body, state)

    t0 = time.time()
    s1 = steps_k(state, batch, key, 1)
    np.asarray(s1.step)
    compile_s = time.time() - t0
    np.asarray(steps_k(state, batch, key, 4).step)

    t_step = slope(lambda k: np.asarray(steps_k(state, batch, key,
                                                k).step))
    global_b = MICRO_B * ACCUM
    audio_s_per_s = global_b * UTT_S / t_step
    # FWD_TFLOP is the flagship estimate — meaningless for --tiny smoke
    train_flop = 0.0 if TINY else 3.0 * FWD_TFLOP * 1e12
    mfu = train_flop / (t_step * PEAK_TFLOPS * 1e12)

    out = {
        "metric": "train_step_audio_seconds_per_s_per_chip",
        "value": round(audio_s_per_s, 1),
        "unit": "audio-s/s",
        "vs_baseline": None,
        "detail": {
            "model": "paraformer-large-arch(220M)" if not TINY else "tiny",
            "n_params": n_params,
            "global_batch": global_b,
            "micro_batch": MICRO_B,
            "accum_grad": ACCUM,
            "utt_seconds": UTT_S,
            "t_lfr": T_LFR,
            "label_len": U,
            "step_ms": round(t_step * 1e3, 1),
            "steps_per_s": round(1.0 / t_step, 2),
            "est_model_tflop_per_step": round(train_flop / 1e12, 2),
            "est_mfu_vs_190tflops_bf16": round(mfu, 3),
            "dtype": "bf16 compute / fp32 params+adamw",
            "compile_s": round(compile_s, 1),
            "init_s": round(init_s, 1),
            "total_wall_s": round(time.time() - t_all, 1),
            "note": ("random weights/features (egress-gated); the full "
                     "train_step incl. grad-accum scan, clip, non-finite "
                     "skip, adamw; K-slope timed (fori_loop-chained "
                     "steps); MFU vs the 190 TFLOPs bf16 calibration "
                     "with an analytic model-FLOP estimate"),
        },
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_TRAIN.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Round-5 pipeline profiler: fine-grained device + host stage costs on the
real TPU chip, to target the BENCH_PIPELINE levers (VERDICT r4 item 1).

Measures, K-slope style (same discipline as bench_pipeline.py):
  - fbank XLA vs Pallas on the 600 s VAD input
  - LFR+CMVN and frame_decibel separately
  - FSMN-VAD scorer
  - ASR at the r4 flat (54, 15 s) packing vs length-bucketed packings
  - ASR frontend vs model split
  - punc encoder fp32 vs bf16 at representative (B, W) buckets
  - host stages: ids2tokens / ts_prediction / sentence_postprocess /
    punc window loop, per component

Writes /tmp/profile_r5.json and prints it.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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

FS = 16000
AUDIO_S = 600.0
MERGE_S = 15

REPORT = {}


def _timed(fn):
    t0 = time.time()
    fn()
    return time.time() - t0


def slope(call, k_small=1, k_big=6, reps=3):
    t1 = min(_timed(lambda: call(k_small)) for _ in range(reps))
    t2 = min(_timed(lambda: call(k_big)) for _ in range(reps))
    return max(t2 - t1, 1e-9) / (k_big - k_small)


def plan_segments(rng, total_s):
    segs, t = [], 0.3
    while t < total_s - 2.0:
        dur = float(rng.uniform(2.0, 12.0))
        end = min(t + dur, total_s - 0.1)
        segs.append([int(t * 1000), int(end * 1000)])
        t = end + float(rng.uniform(0.3, 0.8))
    return segs


def main():
    from funasr_tpu.auto.auto_model import AutoModel
    from funasr_tpu.config import load_config
    from funasr_tpu.ops import quant
    from funasr_tpu.utils.vad_utils import merge_vad, slice_audio_by_segments

    rng = np.random.default_rng(0)
    t_all = time.time()

    asr_cfg = load_config("configs/paraformer_large.yaml")
    asr_cfg["model"] = "BiCifParaformer"
    asr_cfg["predictor"] = "CifPredictorV3"
    asr_cfg["tokenizer_conf"] = {
        "token_list": ["<blank>", "<s>", "</s>"]
        + [chr(0x4E00 + i) for i in range(asr_cfg["vocab_size"] - 3)]}
    vad_cfg = load_config("configs/fsmn_vad.yaml")
    punc_cfg = load_config("configs/ct_transformer_punc.yaml")
    punc_cfg["tokenizer_conf"] = {
        "token_list": asr_cfg["tokenizer_conf"]["token_list"][:8404]}

    am = AutoModel(model=asr_cfg, vad_model=vad_cfg, punc_model=punc_cfg,
                   quantize=True)
    quant.enable(True)
    REPORT["build_s"] = round(time.time() - t_all, 1)
    print("build_s", REPORT["build_s"], flush=True)

    n = int(AUDIO_S * FS)
    wav = (0.1 * np.sin(2 * np.pi * 260 * np.arange(n) / FS)
           + 0.02 * rng.standard_normal(n)).astype(np.float32)

    # ---------------- frontend splits on the 600 s input
    from funasr_tpu.ops import fbank as F
    from funasr_tpu.models.fsmn_vad.model import frame_decibel_device

    wav_d = jnp.asarray(wav[None, :])
    vlens = jnp.asarray([n], jnp.int32)
    vfe = am.vad_engine.frontend

    @jax.jit
    def fbank_xla_k(wav, lens, k):
        def body(i, acc):
            f, fl = F.fbank(wav + i.astype(jnp.float32) * 1e-9, lens,
                            num_mel_bins=80, fs=FS, window_type="hamming",
                            dither=0.0)
            return acc + jnp.sum(f[:, -1, :1])
        return jax.lax.fori_loop(0, k, body, jnp.zeros(()))

    @jax.jit
    def fbank_pal_k(wav, lens, k):
        from funasr_tpu.ops.fbank_pallas import fbank_pallas

        def body(i, acc):
            f, fl = fbank_pallas(wav + i.astype(jnp.float32) * 1e-9, lens,
                                 num_mel_bins=80)
            return acc + jnp.sum(f[:, -1, :1])
        return jax.lax.fori_loop(0, k, body, jnp.zeros(()))

    @jax.jit
    def db_k(wav, k):
        def body(i, acc):
            db = frame_decibel_device(wav + i.astype(jnp.float32) * 1e-9)
            return acc + jnp.sum(db[:, :1])
        return jax.lax.fori_loop(0, k, body, jnp.zeros(()))

    np.asarray(fbank_xla_k(wav_d, vlens, 1)); np.asarray(fbank_xla_k(wav_d, vlens, 6))
    REPORT["fbank_xla_600s_ms"] = round(slope(lambda k: np.asarray(fbank_xla_k(wav_d, vlens, k))) * 1e3, 3)
    print("fbank_xla", REPORT["fbank_xla_600s_ms"], flush=True)
    try:
        np.asarray(fbank_pal_k(wav_d, vlens, 1)); np.asarray(fbank_pal_k(wav_d, vlens, 6))
        REPORT["fbank_pallas_600s_ms"] = round(slope(lambda k: np.asarray(fbank_pal_k(wav_d, vlens, k))) * 1e3, 3)
    except Exception as e:
        REPORT["fbank_pallas_600s_ms"] = f"failed: {type(e).__name__}: {e}"
    print("fbank_pallas", REPORT["fbank_pallas_600s_ms"], flush=True)
    np.asarray(db_k(wav_d, 1)); np.asarray(db_k(wav_d, 6))
    REPORT["frame_decibel_600s_ms"] = round(slope(lambda k: np.asarray(db_k(wav_d, k))) * 1e3, 3)
    print("db", REPORT["frame_decibel_600s_ms"], flush=True)

    # full VAD frontend (fbank+LFR5+cmvn) as the engine runs it
    @jax.jit
    def vfe_k(wav, lens, k):
        def body(i, acc):
            f, fl = vfe.device_features(wav + i.astype(jnp.float32) * 1e-9, lens)
            return acc + jnp.sum(f[:, -1, :1])
        return jax.lax.fori_loop(0, k, body, jnp.zeros(()))

    np.asarray(vfe_k(wav_d, vlens, 1)); np.asarray(vfe_k(wav_d, vlens, 6))
    REPORT["vad_frontend_full_ms"] = round(slope(lambda k: np.asarray(vfe_k(wav_d, vlens, k))) * 1e3, 3)
    print("vad_frontend_full", REPORT["vad_frontend_full_ms"], flush=True)

    # VAD scorer
    vadm = am.vad_engine.model
    feats, flens = vfe.device_features(wav_d, vlens)
    feats = jax.device_put(np.asarray(feats))
    vp = vadm.params

    @jax.jit
    def vad_k(params, feats, k):
        def body(i, acc):
            post = vadm.scorer.apply(params, feats + i.astype(jnp.float32) * 1e-8)
            return acc + jnp.sum(post[:, -1])
        return jax.lax.fori_loop(0, k, body, jnp.zeros(()))

    np.asarray(vad_k(vp, feats, 1)); np.asarray(vad_k(vp, feats, 6))
    REPORT["vad_scorer_ms"] = round(slope(lambda k: np.asarray(vad_k(vp, feats, k))) * 1e3, 3)
    print("vad_scorer", REPORT["vad_scorer_ms"], flush=True)

    # ---------------- ASR packings
    segments = merge_vad(plan_segments(rng, AUDIO_S), MERGE_S * 1000)
    clips = slice_audio_by_segments(wav, segments, FS)
    REPORT["n_segments"] = len(clips)
    REPORT["seg_lens_s"] = [round(len(c) / FS, 2) for c in clips]
    eng = am.engine

    def run_asr_batch(idxs, Tpad, max_tokens):
        """slope-time one packed batch at (len(idxs), Tpad)."""
        B = len(idxs)
        wavb = np.zeros((B, Tpad), np.float32)
        lensb = np.zeros((B,), np.int32)
        for j, i in enumerate(idxs):
            c = clips[i][:Tpad]
            wavb[j, : len(c)] = c
            lensb[j] = len(c)
        wav_b, len_b = jnp.asarray(wavb), jnp.asarray(lensb)

        @jax.jit
        def asr_k(params, wavb, lensb, k):
            def body(i, acc):
                w = wavb + i.astype(jnp.float32) * 1e-8
                f, fl = eng.frontend.device_features(w, lensb)
                toks, tl, ua, up = eng.module.apply(
                    params, f, fl, max_tokens=max_tokens,
                    method=eng.module.timestamps)
                return acc + jnp.sum(tl) + jnp.sum(toks[:, :1])
            return jax.lax.fori_loop(0, k, body, jnp.zeros((), jnp.int32))

        np.asarray(asr_k(eng.params, wav_b, len_b, 1))
        np.asarray(asr_k(eng.params, wav_b, len_b, 6))
        return slope(lambda k: np.asarray(asr_k(eng.params, wav_b, len_b, k)))

    # r4 flat: all segments at 15 s
    order = sorted(range(len(clips)), key=lambda i: -len(clips[i]))
    t0 = time.time()
    t_flat = run_asr_batch(order, MERGE_S * FS, 128)
    REPORT["asr_flat_54x15s_ms"] = round(t_flat * 1e3, 3)
    REPORT["asr_flat_compile_s"] = round(time.time() - t0, 1)
    print("asr_flat", REPORT["asr_flat_54x15s_ms"], flush=True)

    # bucketed: group by ceil to 4 s buckets {4, 8, 12, 15}
    buckets = {}
    for i in order:
        ls = len(clips[i]) / FS
        for b in (4, 8, 12, 15):
            if ls <= b:
                buckets.setdefault(b, []).append(i)
                break
    t_buck = 0.0
    det = {}
    t0 = time.time()
    for b, idxs in sorted(buckets.items()):
        mt = max(16, int(np.ceil(b / 15.0 * 128 / 16)) * 16)
        tb = run_asr_batch(idxs, b * FS, mt)
        det[f"{b}s_B{len(idxs)}_mt{mt}"] = round(tb * 1e3, 3)
        t_buck += tb
    REPORT["asr_bucketed_ms"] = round(t_buck * 1e3, 3)
    REPORT["asr_bucketed_detail"] = det
    REPORT["asr_bucketed_compile_s"] = round(time.time() - t0, 1)
    print("asr_bucketed", REPORT["asr_bucketed_ms"], det, flush=True)

    # ASR frontend vs model split at the flat packing
    B = len(order)
    Tpad = MERGE_S * FS
    wavb = np.zeros((B, Tpad), np.float32)
    lensb = np.zeros((B,), np.int32)
    for j, i in enumerate(order):
        c = clips[i][:Tpad]
        wavb[j, : len(c)] = c
        lensb[j] = len(c)
    wav_b, len_b = jnp.asarray(wavb), jnp.asarray(lensb)

    @jax.jit
    def fe_k(wavb, lensb, k):
        def body(i, acc):
            f, fl = eng.frontend.device_features(
                wavb + i.astype(jnp.float32) * 1e-8, lensb)
            return acc + jnp.sum(f[:, -1, :1])
        return jax.lax.fori_loop(0, k, body, jnp.zeros(()))

    np.asarray(fe_k(wav_b, len_b, 1)); np.asarray(fe_k(wav_b, len_b, 6))
    REPORT["asr_frontend_54x15s_ms"] = round(slope(lambda k: np.asarray(fe_k(wav_b, len_b, k))) * 1e3, 3)
    print("asr_frontend", REPORT["asr_frontend_54x15s_ms"], flush=True)

    feats_a, flens_a = eng.frontend.device_features(wav_b, len_b)
    feats_a = jax.device_put(np.asarray(feats_a))
    flens_a = jax.device_put(np.asarray(flens_a))

    @jax.jit
    def model_k(params, f, fl, k):
        def body(i, acc):
            toks, tl, ua, up = eng.module.apply(
                params, f + i.astype(jnp.float32) * 1e-8, fl, max_tokens=128,
                method=eng.module.timestamps)
            return acc + jnp.sum(tl)
        return jax.lax.fori_loop(0, k, body, jnp.zeros((), jnp.int32))

    np.asarray(model_k(eng.params, feats_a, flens_a, 1))
    np.asarray(model_k(eng.params, feats_a, flens_a, 6))
    REPORT["asr_model_54x15s_ms"] = round(slope(lambda k: np.asarray(model_k(eng.params, feats_a, flens_a, k))) * 1e3, 3)
    print("asr_model", REPORT["asr_model_54x15s_ms"], flush=True)

    # ---------------- punc fp32 vs bf16 at representative buckets
    pm = am.punc_engine.model
    for dt_name in ("fp32", "bf16"):
        if dt_name == "bf16":
            from funasr_tpu.models.ct_transformer.model import CTTransformer
            mod = CTTransformer(
                vocab_size=punc_cfg["vocab_size"], punc_size=6,
                embed_unit=256, att_unit=256,
                encoder_conf=punc_cfg["encoder_conf"], dtype=jnp.bfloat16)
        else:
            mod = pm.module
        for (Bp, Lw) in ((64, 32), (32, 224), (8, 224)):
            tok_ids = jnp.asarray(rng.integers(3, 8404, size=(Bp, Lw)), jnp.int32)
            tlen = jnp.asarray(np.full((Bp,), Lw), jnp.int32)

            @jax.jit
            def punc_k(params, t, l, k):
                def body(i, acc):
                    tok = (t + i) % 8404
                    with quant.quantized(False):
                        logits = mod.apply(params, tok, l)
                    return acc + jnp.sum(jnp.argmax(logits[0, :4], -1).astype(jnp.int32))
                return jax.lax.fori_loop(0, k, body, jnp.zeros((), jnp.int32))

            np.asarray(punc_k(pm.params, tok_ids, tlen, 1))
            np.asarray(punc_k(pm.params, tok_ids, tlen, 6))
            key = f"punc_{dt_name}_{Bp}x{Lw}_ms"
            REPORT[key] = round(slope(lambda k: np.asarray(punc_k(pm.params, tok_ids, tlen, k))) * 1e3, 3)
            print(key, REPORT[key], flush=True)

    # ---------------- host stage splits
    # collect real ASR outputs at the flat packing
    outs = eng.module.apply(eng.params, feats_a, flens_a, max_tokens=128,
                            method=eng.module.timestamps)
    toks_h, tls_h, uas_h, ups_h = [np.asarray(o) for o in outs]

    from funasr_tpu.utils.postprocess import (join_segment_texts,
                                              sentence_postprocess)
    from funasr_tpu.utils.timestamp_tools import ts_prediction_lfr6_standard

    def t_ids2tokens():
        for j, i in enumerate(order):
            ids = [t for t in toks_h[j, : int(tls_h[j])].tolist() if t != 0]
            eng.tokenizer.ids2tokens(ids)

    def t_tsonly():
        for j, i in enumerate(order):
            ids = [t for t in toks_h[j, : int(tls_h[j])].tolist() if t != 0]
            words = eng.tokenizer.ids2tokens(ids)
            ts_prediction_lfr6_standard(uas_h[j], ups_h[j], list(words),
                                        vad_offset=segments[i][0])

    def t_full():
        texts, all_ts, all_tokens = [], [], []
        for j, i in enumerate(order):
            ids = [t for t in toks_h[j, : int(tls_h[j])].tolist() if t != 0]
            words = eng.tokenizer.ids2tokens(ids)
            _, ts = ts_prediction_lfr6_standard(uas_h[j], ups_h[j],
                                                list(words),
                                                vad_offset=segments[i][0])
            text, ts_kept, raw = sentence_postprocess(words, ts)
            if text:
                texts.append(text)
            all_ts.extend(ts_kept); all_tokens.extend(raw)
        return join_segment_texts(texts), texts

    REPORT["host_ids2tokens_ms"] = round(min(_timed(t_ids2tokens) for _ in range(3)) * 1e3, 2)
    REPORT["host_ids2tokens_plus_ts_ms"] = round(min(_timed(t_tsonly) for _ in range(3)) * 1e3, 2)
    REPORT["host_asr_full_ms"] = round(min(_timed(t_full) for _ in range(3)) * 1e3, 2)
    print("host_asr", REPORT["host_ids2tokens_ms"], REPORT["host_ids2tokens_plus_ts_ms"], REPORT["host_asr_full_ms"], flush=True)

    _, text_by_seg = t_full()

    # punc host loop with stubbed device
    seg_texts = [t for t in text_by_seg if t]
    rounds = []
    real_pib = pm._punc_ids_batch
    real_pi = pm._punc_ids

    def stub_pib(id_lists):
        rounds.append((len(id_lists), max(len(x) for x in id_lists)))
        return [rng.integers(0, len(pm.punc_list), size=(len(x),))
                for x in id_lists]

    pm._punc_ids_batch = stub_pib
    pm._punc_ids = lambda ids: stub_pib([ids])[0]
    try:
        times = []
        for _rep in range(3):
            rounds.clear()
            t0 = time.time()
            pm.inference_batch(seg_texts, am.punc_engine.tokenizer)
            times.append(time.time() - t0)
        REPORT["host_punc_loop_ms"] = round(min(times) * 1e3, 2)
        REPORT["punc_rounds"] = [[int(b), int(w)] for b, w in rounds]

        # split_words + tokens2ids alone
        from funasr_tpu.models.ct_transformer.model import split_words

        def t_sw():
            for t in seg_texts:
                toks = split_words(t)
                am.punc_engine.tokenizer.tokens2ids(toks)

        REPORT["host_punc_splitwords_ms"] = round(min(_timed(t_sw) for _ in range(3)) * 1e3, 2)
    finally:
        pm._punc_ids_batch = real_pib
        pm._punc_ids = real_pi
    print("host_punc", REPORT["host_punc_loop_ms"], REPORT["host_punc_splitwords_ms"], flush=True)

    REPORT["total_wall_s"] = round(time.time() - t_all, 1)
    with open("/tmp/profile_r5.json", "w") as f:
        json.dump(REPORT, f, indent=1)
    print(json.dumps(REPORT))


if __name__ == "__main__":
    main()

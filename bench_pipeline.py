"""BENCH_PIPELINE: long-audio VAD -> ASR(+timestamps, int8) -> punc on one
TPU chip — the reference's "heart of the product" composite
(funasr/auto/auto_model.py:378 inference_with_vad; A10 baseline rows
runtime/docs/benchmark_libtorch_cpp.md:24-31: RTF 0.0076 single-stream,
0.0008 at 20-way concurrency).

What runs (all at reference flagship shapes, random weights):
- FSMN-VAD (configs/fsmn_vad.yaml, 4x250 FSMN, 80 mel LFR5) over the full
  long wav + the C-parity host state machine, merge_vad, slicing;
- BiCifParaformer-large int8 (paraformer_large.yaml + CifPredictorV3)
  batched under the serving budget, WITH 20 ms timestamps
  (upsampled fire track + ts_prediction_lfr6_standard host math);
- CT-Transformer punc (ct_transformer_punc.yaml, 272727-token embed,
  bf16 serving compute) with the real 20-token mini-sentence / 200-token
  cache loop;
- plus a hybrid CTC/attention BEAM column (conformer_hybrid.yaml, device
  tensor beam=10) — the WFST-replacement path's own RTF.

r5 pipeline architecture (the shared frontend, auto_model.py
_inference_with_vad `shared` path): fbank is computed ONCE over the whole
recording inside the VAD program (Pallas kernel) and the ASR stage gathers
its per-segment frames from that grid — bit-identical to fbank-of-slice
(engines.FrontendConfig.raw_fbank), pinned by
tests/test_auto_model.py::test_transcribe_from_fbank_engine_parity.

Timing methodology (same as bench.py): the axon tunnel makes per-call
dispatch ~100 ms and block_until_ready a no-op, so every DEVICE program is
timed by chaining K iterations inside one jitted program and taking the
K-slope; HOST work (state machine, batching, timestamp/punc assembly) is
wall-timed directly on real-size data.  r5 honesty fix: every K-loop body
consumes EVERY output tensor (jnp.sum over all of them) — the r4 bodies
summed single rows, which let XLA dead-code-eliminate most of the VAD
frontend (r5 profile: the 600 s XLA fbank is 183 ms fully consumed, the
r4 vfe slope was ~0).

Segmentation caveat: weights are random (no egress), so the VAD's
DECISIONS are not meaningful; the VAD forward + state-machine COST is
input-independent and timed for real, while the segment plan fed to the
ASR batcher is drawn from a realistic distribution (2-12 s speech,
0.3-0.8 s gaps, 10 ms-aligned like real VAD output, merged to <=15 s by
the real merge_vad).  Same class of caveat as BENCH_INT8_ACCURACY
(kernel-level bound, not a CER claim).

Prints ONE JSON line and writes BENCH_PIPELINE.json.
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

FS = 16000
TINY = "--tiny" in sys.argv  # CPU smoke mode: shrunk nets + short audio
AUDIO_S = 40.0 if TINY else 600.0   # 10 min long-form input
BATCH_SIZE_S = 300       # reference auto_model batch budget
# saturated budget: the serving batch (64 x 15 s) — the TPU analogue of
# the A10 benchmark's 20-way concurrency row (the GPU saturates by
# stacking streams; one chip saturates by batching segments)
BATCH_SIZE_S_SAT = 960
MERGE_S = 15
BASE_SINGLE = 1.0 / 0.0076   # A10 single-stream audio-s/s (131.6)
BASE_20WAY = 1.0 / 0.0008    # A10 20-way audio-s/s (1250)


def _timed(fn):
    t0 = time.time()
    fn()
    return time.time() - t0


def slope(call, k_small=1, k_big=6, reps=3):
    """min-of-reps K-slope seconds per iteration for call(k).  Sub-ms
    programs (punc rounds, VAD scorer) need a long chain: at k_big=6 the
    tunnel's per-call jitter is the same order as the program itself
    (r5.1 measured punc 64x32 anywhere in 0.3-4.7 ms at k_big=6 vs a
    stable 0.36 at k_big=25)."""
    t1 = min(_timed(lambda: call(k_small)) for _ in range(reps))
    t2 = min(_timed(lambda: call(k_big)) for _ in range(reps))
    return max(t2 - t1, 1e-9) / (k_big - k_small)


def plan_segments(rng, total_s):
    """Realistic long-form segmentation: 2-12 s speech, 0.3-0.8 s gaps,
    10 ms-aligned boundaries (real VAD emits 10 ms frame-granular times —
    the alignment the shared-frontend frame gather rests on)."""
    segs, t = [], 0.3
    while t < total_s - 2.0:
        dur = float(rng.uniform(2.0, 12.0))
        end = min(t + dur, total_s - 0.1)
        segs.append([int(t * 100) * 10, int(end * 100) * 10])
        t = end + float(rng.uniform(0.3, 0.8))
    return segs


def main():
    from funasr_tpu.auto.auto_model import AutoModel
    from funasr_tpu.config import load_config
    from funasr_tpu.ops import quant
    from funasr_tpu.utils.vad_utils import merge_vad

    rng = np.random.default_rng(0)
    t_all = time.time()

    # ---------------- build (flagship shapes, random init, int8 on)
    asr_cfg = load_config("configs/paraformer_large.yaml")
    asr_cfg["model"] = "BiCifParaformer"
    asr_cfg["predictor"] = "CifPredictorV3"
    # single-CJK-char vocab: detokenized text re-tokenizes 1:1, so punc
    # token counts equal ASR token counts (f"字{i}" strings split into
    # 2x tokens at the punc stage and inflated its cost artificially)
    asr_cfg["tokenizer_conf"] = {
        "token_list": ["<blank>", "<s>", "</s>"]
        + [chr(0x4E00 + i) for i in range(asr_cfg["vocab_size"] - 3)]}
    vad_cfg = load_config("configs/fsmn_vad.yaml")
    punc_cfg = load_config("configs/ct_transformer_punc.yaml")
    punc_cfg["tokenizer_conf"] = {
        "token_list": asr_cfg["tokenizer_conf"]["token_list"][:8404]}
    if TINY:
        asr_cfg["encoder_conf"].update(num_blocks=2, output_size=32,
                                       linear_units=64, attention_heads=2)
        asr_cfg["decoder_conf"].update(num_blocks=2, att_layer_num=1,
                                       linear_units=64, attention_heads=2)
        asr_cfg["predictor_conf"]["idim"] = 32
        asr_cfg["input_size"] = 560
        punc_cfg.update(vocab_size=9000, embed_unit=32, att_unit=32)
        punc_cfg["encoder_conf"].update(output_size=32, attention_heads=2,
                                        linear_units=64, num_blocks=2)
        vad_cfg["encoder_conf"].update(fsmn_layers=2, linear_dim=32,
                                       proj_dim=16, input_affine_dim=32,
                                       output_affine_dim=32)

    am = AutoModel(model=asr_cfg, vad_model=vad_cfg, punc_model=punc_cfg,
                   quantize=True)
    # AutoModel flips the int8 flag inside generate(); this bench traces
    # the engines' device programs directly, so mirror the serving config
    # explicitly (trace-time flag — CLAUDE.md quant trap)
    quant.enable(True)
    build_s = time.time() - t_all

    n = int(AUDIO_S * FS)
    wav = (0.1 * np.sin(2 * np.pi * 260 * np.arange(n) / FS)
           + 0.02 * rng.standard_normal(n)).astype(np.float32)

    # ---------------- stage 1: VAD shared front (fbank ONCE + LFR5 +
    # frame decibels in one program — engines.VadEngine._front_shared) +
    # FSMN scorer, K-slope with EVERY output consumed
    ve = am.vad_engine
    vadm = ve.model
    wav_d = jnp.asarray(wav[None, :])
    vlens = jnp.asarray([n], jnp.int32)

    @jax.jit
    def vfront_k(wav, lens, k):
        def body(i, acc):
            w = wav + i.astype(jnp.float32) * 1e-9
            raw, rlens, post, flens, db = ve._front_shared(w, lens)
            return (acc + jnp.sum(raw) + jnp.sum(post) + jnp.sum(db)
                    + jnp.sum(rlens + flens).astype(jnp.float32))
        return jax.lax.fori_loop(0, k, body, jnp.zeros(()))

    np.asarray(vfront_k(wav_d, vlens, 1)); np.asarray(vfront_k(wav_d, vlens, 6))
    # fbank + LFR + decibels + FSMN scorer run as ONE fused program (r5.1:
    # the LFR'd feature tensor no longer round-trips HBM between two
    # dispatches); the slope is the whole VAD device stage
    t_vfront = slope(lambda k: np.asarray(vfront_k(wav_d, vlens, k)))

    raw, rlens_d, post_d, flens, db_d = ve._front_shared(wav_d, vlens)
    raw = jax.device_put(np.asarray(raw)[0])  # (F, n_mels) grid
    total_frames = int(rlens_d[0])
    t_vscore = 0.0  # fused into t_vfront
    t_vad_dev = t_vfront

    # VAD host: sil-probs + state machine + merge (real code, real frame
    # count; decisions are random-weight but cost is not).
    post_h = np.asarray(post_d)
    db_h = np.asarray(db_d)[0]

    def vad_host():
        sil = vadm.sil_probs(post_h)[0]
        m = min(len(sil), len(db_h))
        sm = vadm.new_state()
        sm.feed(sil[:m], db_h[:m], is_final=True)
        segs = sm.pop_segments(streaming=False)
        return merge_vad(segs, MERGE_S * 1000)

    t_vad_host = min(_timed(vad_host) for _ in range(3))

    # ---------------- stage 2: ASR int8 + 20 ms timestamps straight from
    # the shared fbank grid (engines.BiCifEngine.transcribe_from_fbank)
    segments = merge_vad(plan_segments(rng, AUDIO_S), MERGE_S * 1000)
    seg_len = [(e - s) * (FS // 1000) for s, e in segments]
    order = sorted(range(len(segments)), key=lambda i: -seg_len[i])

    def plan(budget_s):
        budget = budget_s * FS
        batches, cur, cur_max = [], [], 0
        for i in order:
            m = max(cur_max, seg_len[i])
            if cur and m * (len(cur) + 1) > budget:
                batches.append(cur); cur, cur_max = [], 0
                m = seg_len[i]
            cur.append(i); cur_max = m
        if cur:
            batches.append(cur)
        return batches

    eng = am.engine  # BiCifEngine (int8, timestamps, fbank-domain path)

    def time_asr(batches, collect=False):
        total = 0.0
        outs = []
        for batch in batches:
            starts, nframes = eng.pack_segments_frames(
                [segments[i] for i in batch], total_frames)
            fmax = eng.quantize_frames(int(nframes.max()))
            max_tokens = eng._max_tokens(int(nframes.max()) * 160 + 240)
            starts_d = jnp.asarray(starts)
            nframes_d = jnp.asarray(nframes)

            @jax.jit
            def asr_k(params, raw, starts, nframes, k, fmax=fmax,
                      max_tokens=max_tokens):
                def body(i, acc):
                    idx = starts[:, None] + jnp.arange(fmax)[None, :]
                    idx = jnp.clip(idx, 0, raw.shape[0] - 1)
                    frames = raw[idx] + i.astype(jnp.float32) * 1e-8
                    f, fl = eng.frontend.features_from_fbank(frames,
                                                             nframes)
                    toks, tl, ua, up = eng.module.apply(
                        params, f, fl, max_tokens=max_tokens,
                        method=eng.module.timestamps)
                    return (acc + jnp.sum(tl).astype(jnp.float32)
                            + jnp.sum(toks).astype(jnp.float32)
                            + jnp.sum(ua) + jnp.sum(up))
                return jax.lax.fori_loop(0, k, body, jnp.zeros(()))

            np.asarray(asr_k(eng.params, raw, starts_d, nframes_d, 1))
            np.asarray(asr_k(eng.params, raw, starts_d, nframes_d, 6))
            total += slope(
                lambda k: np.asarray(asr_k(eng.params, raw, starts_d,
                                           nframes_d, k)))
            if collect:
                out = eng._fb_runner()(eng.params, raw, starts_d,
                                       nframes_d, max_tokens, fmax)
                outs.append((batch, [np.asarray(o) for o in out],
                             nframes))
        return total, outs

    def plan_two_buckets():
        """Split the saturated batch at the length cut minimizing total
        padded frames (short segments stop paying 15 s padding; the two
        programs' small-batch MXU inefficiency is the trade)."""
        lens_sorted = [seg_len[i] for i in order]  # desc
        n = len(order)
        if n < 8:
            return [list(order)]
        best, best_cost = None, None
        for cut in range(4, n - 3):
            cost = cut * lens_sorted[0] + (n - cut) * lens_sorted[cut]
            if best_cost is None or cost < best_cost:
                best, best_cost = cut, cost
        return [order[:best], order[best:]]

    plans = {
        "300s": plan(BATCH_SIZE_S),        # reference budget
        "sat": plan(BATCH_SIZE_S_SAT),     # saturated single batch
        "sat2": plan_two_buckets(),        # length-bucketed saturated
    }
    t_plans = {}
    asr_outputs = None
    for name, batches_p in plans.items():
        t_plans[name], outs = time_asr(batches_p, collect=(name == "sat"))
        if name == "sat":
            asr_outputs = outs
    # the server is free to pick its batch plan: headline = fastest
    best_plan = min(t_plans, key=t_plans.get)
    t_asr_dev, batches = t_plans[best_plan], plans[best_plan]
    t_asr_ref = t_plans["300s"]
    t_asr_sat = t_plans["sat"]

    # ASR host: the engine's real host stage (_ts_results: detokenize +
    # pad-invariant 20 ms timestamp assembly + postprocess)
    from funasr_tpu.utils.postprocess import join_segment_texts

    def asr_host():
        texts_by_idx = {}
        all_ts, all_tokens = [], []
        for batch, (toks, tls, uas, ups), nframes in asr_outputs:
            res = eng._ts_results(
                [None] * len(batch), toks, tls, uas, ups,
                [segments[i][0] for i in batch],
                us_lens=eng._us_lens(nframes, in_frames=True))
            for i, r in zip(batch, res):
                texts_by_idx[i] = r["text"]
                all_ts.extend(r["timestamp"])
                all_tokens.extend(r["raw_tokens"])
        texts = [texts_by_idx[i] for i in range(len(segments))
                 if texts_by_idx.get(i)]
        return join_segment_texts(texts), all_ts, all_tokens, texts

    t_asr_host = min(_timed(asr_host) for _ in range(3))
    text, all_ts, all_tokens, text_by_seg = asr_host()

    # ---------------- stage 3: CT-Transformer punc (per-VAD-segment
    # batched rounds, CTTransformerModel.inference_batch, bf16 serving)
    pm = am.punc_engine.model
    seg_texts = [t for t in (text_by_seg if text_by_seg else [text]) if t]

    # count the real batched rounds + their (B, W) shapes with the device
    # stubbed at the _punc_ids_batch boundary
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
            # one pass's rounds only: accumulating across the timing reps
            # overcharged punc_device 3x (r4.0 accounting bug)
            rounds.clear()
            t0 = time.time()
            pm.inference_batch(seg_texts, am.punc_engine.tokenizer)
            times.append(time.time() - t0)
        t_punc_host = min(times)
    finally:
        pm._punc_ids_batch = real_pib
        pm._punc_ids = real_pi

    # device: rounds run at quantized (B, W) buckets (the real
    # inference_batch shapes — later rounds have few active segments and
    # are much cheaper than the first); slope-time each DISTINCT bucket
    # and charge rounds by count.  Full logits consumed.
    from collections import Counter

    def bucket(b, w):
        return (1 << max(b - 1, 0).bit_length(),
                max(8, 8 * ((w + 7) // 8)))

    counts = Counter(bucket(b, w) for b, w in rounds)

    @jax.jit
    def punc_k(params, t, l, k):
        def body(i, acc):
            tok = (t + i) % 8404
            with quant.quantized(False):  # punc pins fp (bf16) compute
                logits = pm.module.apply(params, tok, l)
            return acc + jnp.sum(jnp.argmax(logits, -1).astype(jnp.int32))
        return jax.lax.fori_loop(0, k, body, jnp.zeros((), jnp.int32))

    t_punc_dev = 0.0
    for (Bp, Lw), cnt in counts.items():
        tok_ids = jnp.asarray(
            rng.integers(3, 8404, size=(Bp, Lw)), jnp.int32)
        tlen = jnp.asarray(np.full((Bp,), Lw), jnp.int32)
        np.asarray(punc_k(pm.params, tok_ids, tlen, 1))
        np.asarray(punc_k(pm.params, tok_ids, tlen, 25))
        t_punc_dev += cnt * slope(
            lambda k, ti=tok_ids, tl=tlen:
            np.asarray(punc_k(pm.params, ti, tl, k)),
            k_big=25, reps=5)
    n_windows = sum(b for b, _ in rounds)

    # ---------------- totals
    # serial = one utterance's stages end to end (latency bound).
    # pipelined = saturated-server steady state: device programs serialize
    # on the one chip while host python (detok/timestamps/punc assembly)
    # of OTHER utterances runs under them, so throughput is bound by
    # max(device stage sum, host stage sum) — the single-chip analogue of
    # the A10 benchmark's 20-way-concurrency row (which is itself a
    # saturated-concurrency number).
    t_total_serial = (t_vad_dev + t_vad_host + t_asr_dev + t_asr_host
                      + t_punc_dev + t_punc_host)
    t_device_sum = t_vad_dev + t_asr_dev + t_punc_dev
    t_host_sum = t_vad_host + t_asr_host + t_punc_host
    t_total = max(t_device_sum, t_host_sum)
    pipeline_rate = AUDIO_S / t_total
    serial_rate = AUDIO_S / t_total_serial

    # ---------------- hybrid beam column (WFST-replacement path)
    beam_rate = None
    try:
        hyb_cfg = load_config("configs/conformer_hybrid.yaml")
        hyb_cfg["tokenizer_conf"] = {
            "token_list": ["<blank>", "<s>", "</s>"]
            + [f"字{i}" for i in range(hyb_cfg["vocab_size"] - 3)]}
        if TINY:
            hyb_cfg["encoder_conf"].update(num_blocks=2, output_size=32,
                                           linear_units=64,
                                           attention_heads=2)
            hyb_cfg["decoder_conf"] = dict(
                hyb_cfg.get("decoder_conf") or {}, num_blocks=1,
                linear_units=64, attention_heads=2)
        am_b = AutoModel(model=hyb_cfg, quantize=True)
        be = am_b.engine
        Bb = 8
        Tpad = MERGE_S * FS
        wav_bb = jnp.asarray(
            0.1 * np.sin(2 * np.pi * 260 *
                         np.arange(Tpad) / FS)[None, :].repeat(Bb, 0)
            .astype(np.float32))
        len_bb = jnp.asarray(np.full((Bb,), Tpad, np.int32))

        @jax.jit
        def beam_k(params, w, l, k):
            def body(i, acc):
                feats, flens = be.frontend.device_features(
                    w + i.astype(jnp.float32) * 1e-8, l)
                toks, tls, sc = be.module.apply(
                    params, feats, flens, beam=10, maxlen=96,
                    decoding_ctc_weight=0.3,
                    method=be.module.decode_beam)
                return acc + jnp.sum(tls[:, 0])
            return jax.lax.fori_loop(0, k, body, jnp.zeros((), jnp.int32))

        np.asarray(beam_k(be.params, wav_bb, len_bb, 1))
        np.asarray(beam_k(be.params, wav_bb, len_bb, 3))
        t_beam = slope(lambda k: np.asarray(beam_k(be.params, wav_bb,
                                                   len_bb, k)),
                       k_small=1, k_big=3)
        beam_rate = (Bb * MERGE_S) / t_beam
    except Exception as e:  # keep the pipeline number even if beam fails
        beam_rate = f"failed: {type(e).__name__}: {e}"

    out = {
        "metric": "long_audio_pipeline_audio_seconds_per_s_per_chip",
        "value": round(pipeline_rate, 1),
        "unit": "audio-s/s",
        "vs_baseline": round(pipeline_rate / BASE_20WAY, 2),
        "detail": {
            "audio_s": AUDIO_S,
            "segments": len(segments),
            "asr_batches": [len(b) for b in batches],
            "asr_device_s_at_300s_budget": round(t_asr_ref, 4),
            "asr_device_s_at_960s_budget": round(t_asr_sat, 4),
            "asr_plans_s": {k: round(v, 4) for k, v in t_plans.items()},
            "asr_best_plan": best_plan,
            "stage_s": {
                "vad_device": round(t_vad_dev, 4),
                "vad_host": round(t_vad_host, 4),
                "asr_device": round(t_asr_dev, 4),
                "asr_host": round(t_asr_host, 4),
                "punc_device": round(t_punc_dev, 4),
                "punc_host": round(t_punc_host, 4),
            },
            "vad_front_s": round(t_vfront, 4),
            "vad_scorer_s": round(t_vscore, 4),
            "punc_windows": n_windows,
            "punc_rounds": len(rounds),
            "serial_stage_sum_s": round(t_total_serial, 4),
            "serial_audio_s_per_s": round(serial_rate, 1),
            "device_stage_sum_s": round(t_device_sum, 4),
            "host_stage_sum_s": round(t_host_sum, 4),
            "host_over_device_pct": round(100 * t_host_sum
                                          / max(t_device_sum, 1e-9), 1),
            "rtf": round(1.0 / pipeline_rate, 6),
            "vs_a10_single_stream": round(pipeline_rate / BASE_SINGLE, 1),
            "vs_a10_20way": round(pipeline_rate / BASE_20WAY, 1),
            "hybrid_beam_audio_s_per_s": beam_rate
            if isinstance(beam_rate, str) else round(beam_rate, 1),
            "build_s": round(build_s, 1),
            "total_wall_s": round(time.time() - t_all, 1),
            "note": ("random weights; VAD decisions pinned to a realistic"
                     " 10 ms-aligned segment plan (see module docstring);"
                     " r5: shared frontend (fbank once, Pallas kernel;"
                     " ASR gathers segment frames from the grid), bf16"
                     " punc, every device K-loop consumes all outputs"
                     " (r4 bodies were partially DCE'd); device stages"
                     " K-slope timed, host stages wall timed; headline"
                     " ASR = faster of the reference 300 s batch budget"
                     " and the saturated 960 s serving batch"),
        },
    }
    if not TINY:  # CLAUDE.md trap: tiny smoke runs must never clobber
        # the real-chip artifact
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_PIPELINE.json"), "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

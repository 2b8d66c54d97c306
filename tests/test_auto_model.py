"""AutoModel pipeline tests (tiny random models, synthetic audio)."""

import numpy as np
import jax
import pytest

from funasr_tpu.auto.auto_model import AutoModel

VOCAB = ["<blank>", "<s>", "</s>"] + list("我们今天去公园玩吧好的一二三四五")

ASR_CFG = dict(
    model="Paraformer",
    vocab_size=len(VOCAB),
    tokenizer_conf={"token_list": VOCAB},
    frontend_conf=dict(n_mels=20, lfr_m=3, lfr_n=2),
    input_size=60,
    encoder_conf=dict(output_size=16, attention_heads=2, linear_units=32,
                      num_blocks=2, kernel_size=5, dropout_rate=0.0),
    decoder_conf=dict(attention_heads=2, linear_units=32, num_blocks=1,
                      att_layer_num=1, kernel_size=5, dropout_rate=0.0),
    predictor_conf=dict(idim=16, tail_threshold=0.45, dropout=0.0),
)

VAD_CFG = dict(
    model="FsmnVADStreaming",
    encoder="FSMN",
    encoder_conf=dict(input_dim=60, input_affine_dim=32, fsmn_layers=2,
                      linear_dim=32, proj_dim=16, lorder=5, rorder=0,
                      lstride=1, rstride=1, output_affine_dim=32, output_dim=4),
    frontend_conf=dict(n_mels=20, lfr_m=3, lfr_n=1),
    model_conf=dict(max_end_silence_time=500),
)

PUNC_CFG = dict(
    model="CTTransformer",
    vocab_size=len(VOCAB),
    tokenizer_conf={"token_list": VOCAB},
    embed_unit=16,
    att_unit=16,
    encoder_conf=dict(output_size=16, attention_heads=2, linear_units=32,
                      num_blocks=2, kernel_size=5, dropout_rate=0.0),
)


def _wav(rng, secs=2.0):
    n = int(16000 * secs)
    return (0.3 * np.sin(2 * np.pi * 220 * np.arange(n) / 16000)
            + 0.01 * rng.standard_normal(n)).astype(np.float32)


def test_generate_plain(rng):
    am = AutoModel(model=ASR_CFG)
    res = am.generate([_wav(rng), _wav(rng, 1.0)], key=["a", "b"])
    assert [r["key"] for r in res] == ["a", "b"]
    assert all("text" in r for r in res)


def test_generate_sensevoice(rng):
    cfg = dict(
        model="SenseVoiceSmall",
        vocab_size=len(VOCAB),
        tokenizer_conf={"token_list": VOCAB},
        frontend_conf=dict(n_mels=20, lfr_m=3, lfr_n=2),
        input_size=60,
        encoder_conf=dict(output_size=16, attention_heads=2, linear_units=32,
                          num_blocks=2, tp_blocks=1, kernel_size=5,
                          dropout_rate=0.0),
    )
    am = AutoModel(model=cfg)
    res = am.generate([_wav(rng, 1.0)])
    assert len(res) == 1 and "text" in res[0]


def test_generate_with_vad_punc_pipeline(rng):
    am = AutoModel(model=ASR_CFG, vad_model=VAD_CFG, punc_model=PUNC_CFG)
    wav = np.concatenate([
        np.zeros(8000, np.float32), _wav(rng, 2.0),
        np.zeros(12000, np.float32), _wav(rng, 1.5),
        np.zeros(8000, np.float32),
    ])
    res = am.generate(wav, key=["long"])
    assert len(res) == 1
    r = res[0]
    assert r["key"] == "long"
    assert "text" in r  # may be empty with random weights, but present
    assert "timestamp" in r


SPK_CFG = dict(
    model="CAMPPlus",
    model_conf=dict(feat_dim=80, embedding_size=16, growth_rate=4, bn_size=2,
                    init_channels=8, blocks=((2, 3, 1), (2, 3, 2))),
)


def test_generate_full_pipeline_with_spk(rng):
    am = AutoModel(model=ASR_CFG, vad_model=VAD_CFG, punc_model=PUNC_CFG,
                   spk_model=SPK_CFG)
    wav = np.concatenate([
        np.zeros(8000, np.float32), _wav(rng, 2.5),
        np.zeros(12000, np.float32), _wav(rng, 1.0),
        np.zeros(8000, np.float32),
    ])
    res = am.generate(wav, key=["diarized"])
    r = res[0]
    assert "spk_info" in r
    assert all(len(seg) == 3 for seg in r["spk_info"])
    # spk labels are contiguous ints starting at 0
    labels = {seg[2] for seg in r["spk_info"]}
    assert labels == set(range(len(labels)))
    if "sentence_info" in r:
        assert all("spk" in s for s in r["sentence_info"])


def test_generate_from_wav_file(tmp_path, rng):
    import wave
    p = tmp_path / "x.wav"
    data = _wav(rng, 1.0)
    with wave.open(str(p), "wb") as w:
        w.setnchannels(1); w.setsampwidth(2); w.setframerate(16000)
        w.writeframes((np.clip(data, -1, 1) * 32767).astype("<i2").tobytes())
    am = AutoModel(model=ASR_CFG)
    res = am.generate(str(p))
    assert res[0]["key"] == "x"


def test_generate_conformer_hybrid(rng):
    cfg = dict(
        model="Conformer",
        vocab_size=len(VOCAB),
        tokenizer_conf={"token_list": VOCAB},
        frontend_conf=dict(n_mels=20, lfr_m=1, lfr_n=1),
        input_size=20,
        encoder_conf=dict(output_size=16, attention_heads=2, linear_units=32,
                          num_blocks=2, cnn_module_kernel=7,
                          dropout_rate=0.0),
        decoder_conf=dict(attention_heads=2, linear_units=32, num_blocks=1,
                          dropout_rate=0.0),
        decoding_conf=dict(beam_size=3, maxlenratio_tokens=8),
    )
    am = AutoModel(model=cfg)
    res = am.generate([_wav(rng, 1.0)])
    assert len(res) == 1 and "text" in res[0] and "score" in res[0]
    # n-best surface (generate(nbest=K)): top hypothesis first, scores
    # sorted, hyp 0 == the 1-best fields
    res = am.generate([_wav(rng, 1.0)], nbest=3)
    hyps = res[0]["nbest"]
    assert len(hyps) == 3
    assert hyps[0]["text"] == res[0]["text"]
    assert hyps[0]["score"] == res[0]["score"]
    scores = [h["score"] for h in hyps]
    assert scores == sorted(scores, reverse=True)


def test_generate_scama(rng):
    """SCAMA through AutoModel: AR chunk-aware beam engine (r4)."""
    cfg = dict(
        model="SCAMA",
        vocab_size=len(VOCAB),
        tokenizer_conf={"token_list": VOCAB},
        frontend_conf=dict(n_mels=20, lfr_m=1, lfr_n=1),
        input_size=20,
        encoder_conf=dict(output_size=16, attention_heads=2, linear_units=32,
                          num_blocks=2, kernel_size=5, dropout_rate=0.0),
        decoder_conf=dict(attention_heads=2, linear_units=32, num_blocks=2,
                          att_layer_num=2, kernel_size=5),
        predictor_conf=dict(idim=16),
        model_conf=dict(chunk_size=4, sampling_ratio=0.0),
        decoding_conf=dict(beam_size=3, maxlenratio_tokens=8),
    )
    am = AutoModel(model=cfg)
    res = am.generate([_wav(rng, 1.0)], nbest=2)
    assert len(res) == 1 and "text" in res[0]
    assert len(res[0]["nbest"]) == 2


def test_generate_transducer(rng):
    cfg = dict(
        model="Transducer",
        vocab_size=len(VOCAB),
        tokenizer_conf={"token_list": VOCAB},
        frontend_conf=dict(n_mels=20, lfr_m=1, lfr_n=1),
        input_size=20,
        encoder_conf=dict(output_size=16, attention_heads=2, linear_units=32,
                          num_blocks=1, cnn_module_kernel=7,
                          dropout_rate=0.0),
        decoder_conf=dict(hidden_size=16, num_layers=1),
        joint_conf=dict(joint_size=16),
    )
    am = AutoModel(model=cfg)
    res = am.generate([_wav(rng, 1.0)])
    assert len(res) == 1 and "text" in res[0]


def test_generate_eparaformer(rng):
    cfg = dict(ASR_CFG)
    cfg["model"] = "EParaformer"
    cfg["predictor_conf"] = dict(idim=16, dropout=0.0, sigma_heads=2)
    am = AutoModel(model=cfg)
    res = am.generate([_wav(rng, 1.0)], key=["e"])
    assert len(res) == 1 and "text" in res[0]


def test_hub_id_resolution(tmp_path, monkeypatch):
    """Hub ids/aliases route through download_model to a local snapshot
    (reference download_model_from_hub.py:8); SDKs absent -> clear error."""
    import funasr_tpu.download as D

    assert D.is_hub_id("paraformer-zh")
    assert D.is_hub_id("iic/SenseVoiceSmall")
    assert not D.is_hub_id(str(tmp_path))

    # a fake snapshot dir wired through the alias map
    snap = tmp_path / "snap"
    snap.mkdir()
    import yaml
    with open(snap / "config.yaml", "w") as f:
        yaml.safe_dump(ASR_CFG, f, allow_unicode=True)
    with pytest.raises(RuntimeError, match="modelscope is not installed"):
        D.download_model("iic/does-not-matter")

    monkeypatch.setattr(D, "download_model", lambda m, **kw: str(snap))
    am = AutoModel(model="paraformer-zh")
    assert am.engine is not None


def test_generate_data_parallel_matches_single(rng):
    """AutoModel(data_parallel=True) shards the decode batch over the
    8-device CPU mesh (engines pad the batch to the mesh size with silence
    rows) and must return the same transcripts as the single-device path."""
    wavs = [_wav(rng), _wav(rng, 1.3), _wav(rng, 1.7)]  # 3 -> pads to 8
    ref = AutoModel(model=ASR_CFG).generate(wavs, key=["a", "b", "c"])
    am = AutoModel(model=ASR_CFG, data_parallel=True)
    assert am.mesh is not None and am.mesh.shape["data"] == 8
    got = am.generate(wavs, key=["a", "b", "c"])
    assert [r["key"] for r in got] == ["a", "b", "c"]
    assert [r["text"] for r in got] == [r["text"] for r in ref]


def test_sensevoice_with_vad_pipeline(rng):
    """SenseVoice + VAD long-audio pipeline must run (the engine accepts
    the pipeline's with_timestamp/vad_offsets kwargs)."""
    sv_cfg = dict(
        model="SenseVoiceSmall",
        vocab_size=len(VOCAB),
        tokenizer_conf={"token_list": VOCAB},
        frontend_conf=dict(n_mels=20, lfr_m=3, lfr_n=2),
        input_size=60,
        encoder_conf=dict(output_size=16, attention_heads=2, linear_units=32,
                          num_blocks=2, tp_blocks=1, kernel_size=5,
                          dropout_rate=0.0),
    )
    am = AutoModel(model=sv_cfg, vad_model=VAD_CFG)
    wav = np.concatenate([
        np.zeros(8000, np.float32), _wav(rng, 2.0),
        np.zeros(12000, np.float32),
    ])
    res = am.generate(wav, key=["sv_long"])
    assert len(res) == 1 and res[0]["key"] == "sv_long"
    assert "text" in res[0]


def test_vad_as_main_model(rng):
    """Standalone VAD: AutoModel(model=<vad cfg>) returns segment lists
    (reference fsmn_vad_streaming inference contract)."""
    am = AutoModel(model=VAD_CFG)
    wav = np.concatenate([
        np.zeros(8000, np.float32), _wav(rng, 2.0),
        np.zeros(8000, np.float32),
    ])
    res = am.generate(wav, key=["v"])
    assert res[0]["key"] == "v"
    segs = res[0]["value"]
    assert segs and all(len(s) == 2 for s in segs)


def test_vad_model_without_main(rng):
    """vad_model without a main model degrades to standalone VAD instead
    of crashing on engine=None."""
    am = AutoModel(vad_model=VAD_CFG)
    wav = np.concatenate([np.zeros(8000, np.float32), _wav(rng, 1.5)])
    res = am.generate(wav)
    assert "value" in res[0]


def test_generate_fs_is_input_rate(rng):
    """generate(fs=8000) treats raw arrays as 8 kHz input and resamples to
    the frontend's 16 kHz (reference load_utils audio_fs semantics) — NOT
    the other way around."""
    t16 = np.arange(32000) / 16000.0
    wav16 = (0.3 * np.sin(2 * np.pi * 220 * t16)).astype(np.float32)
    wav8 = wav16[::2]  # the same 2 s signal sampled at 8 kHz
    am = AutoModel(model=ASR_CFG, seed=0)
    n16 = len(am.generate([wav16], key=["a"])[0]["text"])
    n8 = len(am.generate([wav8], fs=8000, key=["a"])[0]["text"])
    n8_untagged = len(am.generate([wav8], key=["a"])[0]["text"])
    assert abs(n8 - n16) <= 2        # resampled: same duration, same tokens
    assert n8_untagged <= 0.7 * n16  # untagged 8 k reads as 1 s of 16 k


BICIF_CFG = dict(
    model="BiCifParaformer",
    vocab_size=len(VOCAB),
    tokenizer_conf={"token_list": VOCAB},
    frontend_conf=dict(n_mels=20, lfr_m=3, lfr_n=2),
    input_size=60,
    encoder_conf=dict(output_size=16, attention_heads=2, linear_units=32,
                      num_blocks=2, kernel_size=5, dropout_rate=0.0),
    decoder_conf=dict(attention_heads=2, linear_units=32, num_blocks=1,
                      att_layer_num=1, kernel_size=5, dropout_rate=0.0),
    predictor_conf=dict(idim=16, tail_threshold=0.45, dropout=0.0),
)


def test_bicif_engine_timestamps(rng):
    """BiCifParaformer builds through AutoModel and yields 20 ms-accurate
    timestamps (reference paraformer-large timestamp model path)."""
    am = AutoModel(model=BICIF_CFG)
    res = am.generate([_wav(rng, 2.0)], key=["b"])
    assert res[0]["key"] == "b"
    ts = res[0].get("timestamp")
    assert ts is not None
    assert all(e >= b >= 0 for b, e in ts)


def test_seaco_engine_hotwords(rng):
    cfg = dict(BICIF_CFG, model="SeacoParaformer",
               model_conf=dict(no_bias_id=3, inner_dim=16,
                               seaco_decoder_conf=dict(
                                   attention_heads=2, linear_units=32,
                                   num_blocks=1, att_layer_num=1,
                                   kernel_size=5)))
    am = AutoModel(model=cfg)
    res = am.generate([_wav(rng, 1.5)], hotword="我们 公园")
    assert "text" in res[0]
    # no hotwords -> BiCif fallback still works
    res2 = am.generate([_wav(rng, 1.5)])
    assert "text" in res2[0] and "timestamp" in res2[0]


def test_contextual_engine_hotwords(rng):
    cfg = dict(BICIF_CFG, model="ContextualParaformer")
    am = AutoModel(model=cfg)
    res = am.generate([_wav(rng, 1.5)], hotword="今天")
    assert "text" in res[0]


def test_join_segment_texts_mixed():
    """Per-boundary CJK/ascii join (reference sentence_postprocess
    semantics, postprocess_utils.py:144): mixed long audio must not fall
    into a single global space/empty-join decision."""
    from funasr_tpu.utils.postprocess import join_segment_texts

    assert join_segment_texts(["我们今天", "去公园"]) == "我们今天去公园"
    assert join_segment_texts(["hello", "world"]) == "hello world"
    # mixed: space only before the ascii segment
    assert join_segment_texts(["我们今天", "ok go", "去公园"]) \
        == "我们今天 ok go去公园"
    assert join_segment_texts(["", "hello", "", "你好"]) == "hello你好"


def test_sentence_info_survives_punc_mismatch(rng, monkeypatch):
    """When the punc label count mismatches the token count the pipeline
    must emit a best-effort sentence_info (reference always emits it on
    the punc path, funasr/auto/auto_model.py:551-633) instead of silently
    dropping the key."""
    am = AutoModel(model=ASR_CFG, vad_model=VAD_CFG, punc_model=PUNC_CFG)
    wav = np.concatenate([
        np.zeros(8000, np.float32), _wav(rng, 2.0),
        np.zeros(12000, np.float32), _wav(rng, 1.5),
        np.zeros(8000, np.float32),
    ])

    real_punctuate = am.punc_engine.punctuate

    def broken_punctuate(text, **kw):
        out = real_punctuate(text, **kw)
        out["punc_array"] = list(out["punc_array"])[:-1]  # force mismatch
        return out

    monkeypatch.setattr(am.punc_engine, "punctuate", broken_punctuate)
    res = am.generate(wav, key=["long"])
    r = res[0]
    if r.get("text"):  # random weights may emit nothing at all
        assert "sentence_info" in r
        for s in r["sentence_info"]:
            assert {"start", "end", "text"} <= set(s)


def test_bucket_quantize_graduated():
    """Graduated wav buckets: bounded padding waste AND a bounded program
    count (a cold flagship compile is minutes; one bucket per 0.125 s of
    long-utterance length would be a serving hazard)."""
    from funasr_tpu.auto.engines import quantize

    prev = 0
    buckets = set()
    for n in range(1, 16000 * 600, 1600):
        q = quantize(n)
        assert q >= n and q >= 4000
        assert q >= prev  # monotonic
        prev = q
        buckets.add(q)
        if n > 16000 * 16:
            assert (q - n) / n < 0.07  # waste bound past the fine range
    # 10 minutes of audio span under ~300 distinct programs
    assert len(buckets) < 300


def test_automodel_warmup_prebuilds_buckets(rng):
    am = AutoModel(model=ASR_CFG)
    am.warmup(batch_sizes=(1,), seconds=(1, 2))
    out = am.generate(_wav(rng, 1.5))
    assert out and "text" in out[0]


def test_warmup_reaches_asr_engine_despite_vad(monkeypatch):
    """Silence produces no VAD segments, so generate()-based warmup never
    compiled the ASR program; warmup must call each engine directly."""
    am = AutoModel(model=ASR_CFG, vad_model=VAD_CFG, punc_model=PUNC_CFG)
    calls = {"asr": 0, "vad": 0, "punc": 0}
    orig = am.engine.transcribe
    monkeypatch.setattr(am.engine, "transcribe",
                        lambda *a, **k: calls.__setitem__(
                            "asr", calls["asr"] + 1) or orig(*a, **k))
    orig_v = am.vad_engine.transcribe
    monkeypatch.setattr(am.vad_engine, "transcribe",
                        lambda *a, **k: calls.__setitem__(
                            "vad", calls["vad"] + 1) or orig_v(*a, **k))
    orig_p = am.punc_engine.punctuate
    monkeypatch.setattr(am.punc_engine, "punctuate",
                        lambda *a, **k: calls.__setitem__(
                            "punc", calls["punc"] + 1) or orig_p(*a, **k))
    am.warmup(batch_sizes=(1,), seconds=(1,))
    assert calls["asr"] >= 1 and calls["vad"] >= 1 and calls["punc"] >= 1


def test_sequence_parallel_serving_matches_plain(rng):
    """AutoModel(sequence_parallel=8): the SP chain behind generate()
    reproduces the single-device engine's tokens exactly."""
    wavs = [_wav(rng), _wav(rng, 1.3)]
    plain = AutoModel(model=ASR_CFG)
    sp = AutoModel(model=ASR_CFG, sequence_parallel=8)
    assert sp.engine.sp_mesh is not None
    r0 = plain.generate(wavs, key=["a", "b"])
    r1 = sp.generate(wavs, key=["a", "b"])
    assert [r["text"] for r in r1] == [r["text"] for r in r0]
    assert [r["raw_tokens"] for r in r1] == [r["raw_tokens"] for r in r0]


def test_tensor_parallel_serving_matches_plain(rng):
    """AutoModel(tensor_parallel=2): GSPMD-sharded params reproduce the
    single-device outputs."""
    wavs = [_wav(rng), _wav(rng, 1.1)]
    plain = AutoModel(model=ASR_CFG)
    tp = AutoModel(model=ASR_CFG, tensor_parallel=2)
    r0 = plain.generate(wavs, key=["a", "b"])
    r1 = tp.generate(wavs, key=["a", "b"])
    assert [r["text"] for r in r1] == [r["text"] for r in r0]


def test_fbank_slice_of_grid_equals_fbank_of_slice(rng):
    """Kaldi fbank frames are functions of exactly their 400 samples, so
    slicing the whole-recording fbank grid at a 160-sample-aligned offset
    is bit-identical to running fbank on the sliced waveform — the
    invariant the shared-frontend long-audio path rests on
    (engines.FrontendConfig.raw_fbank)."""
    import jax.numpy as jnp

    from funasr_tpu.ops import fbank as F

    wav = _wav(rng, 4.0)
    whole, wlens = F.fbank(jnp.asarray(wav[None]),
                           jnp.asarray([len(wav)]), num_mel_bins=20)
    # segment [1.0 s, 3.0 s): starts at sample 16000 = frame 100
    seg = wav[16000:48000]
    part, plens = F.fbank(jnp.asarray(seg[None]),
                          jnp.asarray([len(seg)]), num_mel_bins=20)
    n = int(plens[0])
    np.testing.assert_array_equal(
        np.asarray(whole[0, 100 : 100 + n]), np.asarray(part[0, :n]))


def test_shared_frontend_pipeline_matches_waveform_path(rng, monkeypatch):
    """The long-audio pipeline's shared-frontend path (fbank once, ASR
    gathers segment frames from the grid) returns the same text and
    timestamps as the per-segment waveform path."""
    am = AutoModel(model=BICIF_CFG, vad_model=VAD_CFG)
    wav = np.concatenate([
        np.zeros(6000, np.float32), _wav(rng, 2.5),
        np.zeros(12000, np.float32), _wav(rng, 1.5),
        np.zeros(6000, np.float32),
    ])
    got = am.generate(wav, key=["s"])[0]
    monkeypatch.setenv("FUNASR_TPU_DISABLE_SHARED_FRONTEND", "1")
    want = am.generate(wav, key=["s"])[0]
    assert got["text"] == want["text"]
    assert got.get("timestamp") == want.get("timestamp")


def test_transcribe_from_fbank_engine_parity(rng):
    """BiCifEngine.transcribe_from_fbank == transcribe on the sliced
    waveforms (text, tokens and pad-invariant timestamps)."""
    import jax.numpy as jnp

    am = AutoModel(model=BICIF_CFG)
    eng = am.engine
    wav = np.concatenate([_wav(rng, 2.0), _wav(rng, 3.0),
                          _wav(rng, 1.2)])
    segments = [[0, 2000], [2000, 5000], [5000, 6200]]
    raw, rlens = eng.frontend.raw_fbank(
        jnp.asarray(wav[None]), jnp.asarray([len(wav)]))
    got = eng.transcribe_from_fbank(
        raw[0], segments, vad_offsets=[s for s, _ in segments],
        total_frames=int(rlens[0]))
    clips = [wav[s * 16 : e * 16] for s, e in segments]
    want = eng.transcribe(clips, with_timestamp=True,
                          vad_offsets=[s for s, _ in segments])
    assert [r["text"] for r in got] == [r["text"] for r in want]
    assert [r["timestamp"] for r in got] == [r["timestamp"] for r in want]


def test_hybrid_nbest_with_timestamps(rng):
    """generate(nbest=K) entries each carry their own CTC-forced-aligned
    timestamps (VERDICT r4 item 8 — the WFST lattice word-timing role)."""
    cfg = dict(
        model="Conformer",
        vocab_size=len(VOCAB),
        tokenizer_conf={"token_list": VOCAB},
        frontend_conf=dict(n_mels=20, lfr_m=1, lfr_n=1),
        input_size=20,
        encoder_conf=dict(output_size=16, attention_heads=2,
                          linear_units=32, num_blocks=2,
                          cnn_module_kernel=5, dropout_rate=0.0),
        decoder_conf=dict(attention_heads=2, linear_units=32, num_blocks=1,
                          dropout_rate=0.0),
        model_conf=dict(ctc_weight=0.3),
    )
    am = AutoModel(model=cfg)
    res = am.generate([_wav(rng, 1.5)], nbest=3, with_timestamp=True)[0]
    assert "timestamp" in res and "nbest" in res
    assert len(res["nbest"]) == 3
    for hyp in res["nbest"]:
        assert "timestamp" in hyp and "score" in hyp
        assert len(hyp["timestamp"]) == len(hyp["raw_tokens"])
        assert all(e >= b >= 0 for b, e in hyp["timestamp"])
    # 1-best timestamps match the first n-best entry
    assert res["timestamp"] == res["nbest"][0]["timestamp"]

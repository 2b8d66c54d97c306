"""Data pipeline tests: audio I/O, jsonl index, samplers, dataset collation."""

import json
import os
import wave

import numpy as np
import jax
import pytest

from funasr_tpu.datasets.dataset import AudioDataset
from funasr_tpu.datasets.index_ds import IndexDSJsonl
from funasr_tpu.datasets.samplers import DynamicBatchSampler, quantize_length
from funasr_tpu.ops.specaug import spec_aug_lfr
from funasr_tpu.tokenizer.char_tokenizer import CharTokenizer
from funasr_tpu.utils.audio import load_audio, resample_linear


def _write_wav(path, data, fs=16000):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(fs)
        w.writeframes((np.clip(data, -1, 1) * 32767).astype("<i2").tobytes())


@pytest.fixture
def corpus(tmp_path, rng):
    """Tiny synthetic wav+jsonl corpus."""
    recs = []
    for i in range(10):
        n = 1600 * (i + 2)
        wav = rng.standard_normal(n).astype(np.float32) * 0.1
        p = tmp_path / f"utt{i}.wav"
        _write_wav(p, wav)
        text = "你 好 世 界"[: 2 * ((i % 4) + 1)].strip()
        recs.append(
            dict(key=f"utt{i}", source=str(p), target=text,
                 source_len=n, target_len=len(text.split()))
        )
    jsonl = tmp_path / "data.jsonl"
    with open(jsonl, "w", encoding="utf-8") as f:
        for r in recs:
            f.write(json.dumps(r, ensure_ascii=False) + "\n")
    return jsonl, recs


def test_wav_roundtrip(tmp_path, rng):
    data = (rng.standard_normal(1000) * 0.1).astype(np.float32)
    p = tmp_path / "x.wav"
    _write_wav(p, data)
    out = load_audio(str(p))
    assert out.shape == (1000,)
    np.testing.assert_allclose(out, data, atol=1e-4)


def test_resample():
    t = np.arange(8000) / 8000.0
    x = np.sin(2 * np.pi * 100 * t).astype(np.float32)
    y = resample_linear(x, 8000, 16000)
    assert abs(len(y) - 16000) <= 1
    t16 = np.arange(len(y)) / 16000.0
    # linear interp of a 100 Hz tone: small interior error; ignore the last
    # sample (extrapolation clamp)
    np.testing.assert_allclose(
        y[:-2], np.sin(2 * np.pi * 100 * t16)[:-2], atol=5e-2
    )


def test_index_and_dataset(corpus):
    jsonl, recs = corpus
    ids = IndexDSJsonl(str(jsonl))
    assert len(ids) == 10
    tok = CharTokenizer(token_list=["<blank>", "<s>", "</s>", "你", "好", "世", "界"],
                        split_with_space=True)
    ds = AudioDataset(ids, tokenizer=tok)
    item = ds[0]
    assert item["speech"].shape == (recs[0]["source_len"],)
    assert item["text_length"] == recs[0]["target_len"]
    batch = ds.collate([ds[0], ds[1]], pad_speech_len=8000, pad_text_len=6)
    assert batch["speech"].shape == (2, 8000)
    assert batch["text"].shape == (2, 6)
    assert (batch["text"][0, batch["text_lengths"][0]:] == -1).all()


def test_sampler_budget_and_rank_shard():
    src = list(range(100, 1100, 10))  # 100 items
    tgt = [s // 20 for s in src]
    common = dict(source_lens=src, target_lens=tgt, batch_type="length",
                  batch_size=4000, buffer_size=32, shuffle=True, seed=1)
    s0 = DynamicBatchSampler(rank=0, world_size=2, **common)
    s1 = DynamicBatchSampler(rank=1, world_size=2, **common)
    s0.set_epoch(3)
    s1.set_epoch(3)
    b0, b1 = list(s0), list(s1)
    assert len(b0) == len(b1) > 0  # lockstep
    seen = [i for b in b0 + b1 for i in b.indices]
    assert len(seen) == len(set(seen))  # disjoint
    for b in b0:
        mx_s = max(src[i] for i in b.indices)
        mx_t = max(tgt[i] for i in b.indices)
        assert (mx_s + mx_t) * len(b.indices) <= 4000
        assert b.pad_source_len >= mx_s
        assert b.pad_target_len >= mx_t


def test_sampler_epoch_shuffle_and_resume():
    src = list(range(100, 600, 5))
    tgt = [1] * len(src)
    s = DynamicBatchSampler(src, tgt, batch_type="example", batch_size=8,
                            buffer_size=50, shuffle=True, seed=0)
    s.set_epoch(0)
    e0 = [b.indices for b in s]
    s.set_epoch(1)
    e1 = [b.indices for b in s]
    assert e0 != e1  # epoch changes order
    s.set_epoch(0, start_step=3)
    resumed = [b.indices for b in s]
    assert resumed == e0[3:]  # mid-epoch resume


def test_quantize_grid_bounds_shapes():
    grid = [64, 128, 256]
    assert quantize_length(1, grid) == 64
    assert quantize_length(65, grid) == 128
    assert quantize_length(999, grid) == 256


def test_specaug_lfr_masks():
    rng = jax.random.PRNGKey(0)
    import jax.numpy as jnp
    x = jnp.ones((2, 50, 560))
    y, lens = spec_aug_lfr(rng, x, jnp.array([50, 40]),
                           freq_mask_width_range=(5, 30), lfr_rate=6,
                           time_mask_width_range=(5, 12))
    y = np.asarray(y)
    assert (y == 0).any()  # something masked
    # freq mask replicates across stacked copies: zero columns come in groups
    zero_cols = np.nonzero((y[0] == 0).all(axis=0))[0]
    assert len(zero_cols) >= 2 * 5  # at least width x >=2 visible copies


def test_hotword_dataset(tmp_path, rng):
    import json
    import wave as wavmod

    from funasr_tpu.datasets.dataset import AudioDatasetHotword
    from funasr_tpu.datasets.index_ds import IndexDSJsonl
    from funasr_tpu.tokenizer.char_tokenizer import CharTokenizer

    wav_path = tmp_path / "a.wav"
    with wavmod.open(str(wav_path), "wb") as w:
        w.setnchannels(1); w.setsampwidth(2); w.setframerate(16000)
        w.writeframes((rng.standard_normal(1600) * 1000).astype("<i2").tobytes())
    recs = [{"key": f"u{i}", "source": str(wav_path),
             "target": "我 们 今 天 去 公 园", "source_len": 1600,
             "target_len": 7} for i in range(4)]
    p = tmp_path / "d.jsonl"
    p.write_text("\n".join(json.dumps(r, ensure_ascii=False) for r in recs))
    tok = CharTokenizer(token_list=["<blank>", "<s>", "</s>"]
                        + list("我们今天去公园"))
    ds = AudioDatasetHotword(IndexDSJsonl(str(p)), tokenizer=tok,
                             sample_rate=1.0, hotword_min_length=2,
                             hotword_max_length=3, seed=0)
    items = [ds[i] for i in range(len(ds))]
    assert any("hotword" in it for it in items)
    batch = ds.collate(items)
    assert "hotword_pad" in batch and "seaco_label_pad" in batch
    H, Lh = batch["hotword_pad"].shape
    assert H == sum("hotword" in it for it in items) + 1
    assert (batch["hotword_lengths"] >= 1).all()
    # labels: hotword spans carry token ids, elsewhere no_bias_id 0
    lab = batch["seaco_label_pad"]
    assert lab.shape == batch["text"].shape
    covered = (lab > 0).sum()
    assert covered > 0


def test_specaug_time_warp():
    import jax
    import jax.numpy as jnp
    from funasr_tpu.ops.specaug import time_warp

    B, T, F = 2, 60, 8
    # a ramp along time: warping must keep it monotone and preserve range
    x = jnp.broadcast_to(jnp.arange(T, dtype=jnp.float32)[None, :, None],
                         (B, T, F))
    lens = jnp.array([60, 40], jnp.int32)
    y = jax.jit(lambda k, x, l: time_warp(k, x, l, window=5))(
        jax.random.PRNGKey(3), x, lens)
    y = np.asarray(y)
    assert y.shape == (B, T, F)
    # still monotone non-decreasing in time within the valid region
    assert (np.diff(y[0, :60, 0]) >= -1e-4).all()
    assert (np.diff(y[1, :40, 0]) >= -1e-4).all()
    # warped: some interior frame moved
    assert np.abs(y[0, :60, 0] - np.arange(60)).max() > 0.5
    # padding region untouched for the short sample
    np.testing.assert_allclose(y[1, 40:, 0], np.arange(40, 60), atol=1e-4)
    # endpoints fixed
    assert abs(float(y[0, 0, 0])) < 1e-4


def test_specaug_lfr_with_warp_runs():
    import jax
    import jax.numpy as jnp

    x = jnp.ones((2, 50, 24))
    y, lens = spec_aug_lfr(jax.random.PRNGKey(0), x, jnp.array([50, 40]),
                           apply_time_warp=True, lfr_rate=3,
                           freq_mask_width_range=(0, 4),
                           time_mask_width_range=(0, 5))
    assert y.shape == x.shape


def test_llm_chat_dataset(tmp_path, rng):
    import json
    import wave as wavmod

    from funasr_tpu.datasets.llm_dataset import (
        LLMDataset,
        assistant_reply,
        render_prompt,
    )
    from funasr_tpu.datasets.index_ds import IndexDSJsonl
    from funasr_tpu.tokenizer.char_tokenizer import CharTokenizer

    msgs = [{"role": "user", "content": "<audio>转写"},
            {"role": "assistant", "content": "你好"}]
    p = render_prompt(msgs, "qwen")
    assert "<|im_start|>user" in p and p.endswith("<|im_start|>assistant\n")
    assert "<audio>" not in p
    assert assistant_reply(msgs) == "你好"

    wav_path = tmp_path / "a.wav"
    with wavmod.open(str(wav_path), "wb") as w:
        w.setnchannels(1); w.setsampwidth(2); w.setframerate(16000)
        w.writeframes((rng.standard_normal(800) * 1000).astype("<i2").tobytes())
    recs = [
        {"key": "u0", "source": str(wav_path), "source_len": 800,
         "messages": msgs, "target_len": 2},
        {"key": "u1", "source": str(wav_path), "source_len": 800,
         "target": "好", "target_len": 1},  # plain fallback
    ]
    jp = tmp_path / "chat.jsonl"
    jp.write_text("\n".join(json.dumps(r, ensure_ascii=False) for r in recs))
    tok = CharTokenizer(token_list=["<unk>"] + list("你好转写这段音频user"))
    ds = LLMDataset(IndexDSJsonl(str(jp)), tokenizer=tok, template="qwen")
    items = [ds[i] for i in range(2)]
    assert items[0]["text_length"] == 2  # 你好
    assert items[1]["text_length"] == 1
    batch = ds.collate(items)
    assert "prompt" in batch and batch["prompt"].shape[0] == 2
    assert (batch["prompt_lengths"] > 0).all()


def test_kws_mt_dataset(corpus):
    from funasr_tpu.datasets.dataset import KwsMTDataset

    jsonl, recs = corpus
    ids = IndexDSJsonl(str(jsonl))
    toks = ["<blank>", "<s>", "</s>", "你", "好", "世", "界"]
    tok_kw = CharTokenizer(token_list=toks[:5], split_with_space=True)
    tok_asr = CharTokenizer(token_list=toks, split_with_space=True)
    ds = KwsMTDataset(ids, tokenizer=tok_kw, tokenizer2=tok_asr)
    item = ds[3]
    assert "text" in item and "text2" in item
    batch = ds.collate([ds[0], ds[3]], pad_speech_len=16000,
                       pad_text_len=6, pad_text2_len=6)
    assert batch["text"].shape == (2, 6) and batch["text2"].shape == (2, 6)
    assert (batch["text2"][0, batch["text2_lengths"][0]:] == -1).all()
    # same target, two vocabularies: lengths agree, ids may differ
    assert (batch["text_lengths"] == batch["text2_lengths"]).all()


def test_sensevoice_ctc_dataset(tmp_path, rng):
    from funasr_tpu.datasets.dataset import SenseVoiceCTCDataset

    n = 3200
    wav = rng.standard_normal(n).astype(np.float32) * 0.1
    p = tmp_path / "sv.wav"
    _write_wav(p, wav)
    rec = dict(key="sv0", source=str(p), target="你 好",
               source_len=n, target_len=2,
               text_language="<|en|>", emo_target="<|HAPPY|>",
               event_target="<|BGM|>", with_or_wo_itn="<|withitn|>")
    jsonl = tmp_path / "sv.jsonl"
    with open(jsonl, "w", encoding="utf-8") as f:
        f.write(json.dumps(rec, ensure_ascii=False) + "\n")
    toks = ["<blank>", "<s>", "</s>", "你", "好",
            "<|en|>", "<|HAPPY|>", "<|BGM|>", "<|withitn|>"]

    class _SVTok:
        def encode(self, s):
            import re
            out = []
            for piece in re.findall(r"<\|[^|]+\|>|\S", s):
                if piece in toks:
                    out.append(toks.index(piece))
            return out

    ds = SenseVoiceCTCDataset(IndexDSJsonl(str(jsonl)), tokenizer=_SVTok())
    item = ds[0]
    # [lid, emo, event, itn, text...]
    assert item["text"][:4].tolist() == [5, 6, 7, 8]
    assert item["text_length"] == 6


def test_dataloader_entry(corpus):
    """Dataloader (reference DataloaderMapStyle): build_iter with resume +
    data_split slicing."""
    from funasr_tpu.registry import tables

    jsonl, recs = corpus
    ids = IndexDSJsonl(str(jsonl))
    tok = CharTokenizer(token_list=["<blank>", "<s>", "</s>", "你", "好",
                                    "世", "界"], split_with_space=True)
    ds = AudioDataset(ids, tokenizer=tok)
    sampler = tables.build(
        "batch_sampler_classes", "CustomDistributedBatchSampler",
        source_lens=ds.source_lens(), target_lens=ds.target_lens(),
        batch_size=4, shuffle=True, seed=0)
    dl = tables.build("dataloader_classes", "DataloaderMapStyle",
                      dataset=ds, sampler=sampler)
    batches = list(dl.build_iter(epoch=0))
    assert batches and all("speech" in b and "text" in b for b in batches)
    n_items = sum(len(b["keys"]) for b in batches)
    assert n_items == 10
    # mid-epoch resume yields strictly fewer batches
    resumed = list(dl.build_iter(epoch=0, start_step=1))
    assert len(resumed) == len(batches) - 1
    # data_split: both halves together cover the epoch
    dl2 = tables.build("dataloader_classes", "DataloaderMapStyle",
                       dataset=ds, sampler=sampler, data_split_num=2)
    n_split = sum(len(b["keys"]) for i in range(2)
                  for b in dl2.build_iter(0, 0, data_split_i=i))
    assert n_split == 10


def test_specaug_classes():
    import jax
    import jax.numpy as jnp
    from funasr_tpu.registry import tables

    sa = tables.build("specaug_classes", "SpecAugLFR",
                      apply_time_warp=False, num_freq_mask=1,
                      freq_mask_width_range=(0, 5), num_time_mask=1,
                      time_mask_width_range=(0, 4), lfr_rate=6)
    spec = jnp.ones((2, 30, 24))
    lens = jnp.array([30, 20])
    out, out_lens = sa(jax.random.PRNGKey(0), spec, lens)
    assert out.shape == spec.shape and (out_lens == lens).all()
    assert float(out.sum()) < float(spec.sum())  # something was masked
    sa2 = tables.build("specaug_classes", "SpecAug",
                       num_freq_mask=1, freq_mask_width_range=(0, 5),
                       num_time_mask=1, time_mask_width_range=(0, 4))
    out2, _ = sa2(jax.random.PRNGKey(1), spec, lens)
    assert out2.shape == spec.shape


def test_multiturn_dataset(corpus, tmp_path):
    jsonl, recs = corpus
    from funasr_tpu.registry import tables

    # rewrite the corpus with multi-turn messages
    mt = tmp_path / "mt.jsonl"
    with open(mt, "w", encoding="utf-8") as f:
        for r in recs[:4]:
            r = dict(r)
            r["messages"] = [
                {"role": "system", "content": "sys"},
                {"role": "user", "content": "<audio>转写"},
                {"role": "assistant", "content": r["target"]},
                {"role": "user", "content": "再说一遍"},
                {"role": "assistant", "content": r["target"]},
            ]
            f.write(json.dumps(r, ensure_ascii=False) + "\n")
    tok = CharTokenizer(token_list=["<blank>", "<s>", "</s>"]
                        + sorted(set("你好世界转写再说一遍sy假"
                                     "<|im_start>endaustrApct\n ")))
    idx = tables.get("index_ds_classes", "IndexDSJsonl")(str(mt))
    ds = tables.get("dataset_classes", "OpenAIDatasetMultiTurn")(
        idx, tokenizer=tok)
    items = [ds[i] for i in range(len(ds))]
    for it in items:
        # both assistant replies contribute supervised labels
        assert int((it["labels"] >= 0).sum()) >= 2 * 2
        # non-assistant spans are masked
        assert int((it["labels"] < 0).sum()) > 0
    batch = ds.collate(items)
    assert batch["input_ids"].shape == batch["labels"].shape
    assert batch["input_lengths"].max() == batch["input_ids"].shape[1]
    # labels are ignore_id on padding
    row = batch["labels"][np.argmin(batch["input_lengths"])]
    assert (row[batch["input_lengths"].min():] == -1).all()


def test_sensevoice_ar_dataset(corpus):
    jsonl, recs = corpus
    from funasr_tpu.registry import tables

    tok = CharTokenizer(token_list=["<blank>", "<s>", "</s>"]
                        + sorted(set("你好世界<|startofnscrip>ASRzhedxt")))
    idx = tables.get("index_ds_classes", "IndexDSJsonl")(str(jsonl))
    ds = tables.get("dataset_classes", "SenseVoiceDataset")(
        idx, tokenizer=tok)
    it = ds[0]
    assert it["prompt_length"] > 0
    assert it["text_length"] > it["prompt_length"]
    batch = ds.collate([ds[0], ds[1]])
    assert "prompt_lengths" in batch and batch["prompt_lengths"].shape == (2,)


def test_text_preprocessors():
    from funasr_tpu.registry import tables

    rp = tables.build("preprocessor_classes",
                      "TextPreprocessRemovePunctuation")
    assert rp("你好，world! ok。") == "你好world ok"
    sd = tables.build("preprocessor_classes", "TextPreprocessSegDict")
    assert sd("  a   b  ") == "a b"


def test_registry_name_parity_full():
    """Every (table, name) the reference registers resolves here."""
    import re
    from funasr_tpu.registry import tables

    ref_root = "/root/reference/funasr"
    pat = re.compile(r'@tables\.register\(\s*"([^"]+)"\s*,\s*"([^"]+)"')
    pairs = set()
    for dirpath, _, files in os.walk(ref_root):
        for fn in files:
            if fn.endswith(".py"):
                with open(os.path.join(dirpath, fn), errors="ignore") as f:
                    pairs.update(pat.findall(f.read()))
    tables._autoload()
    missing = [(t, n) for t, n in sorted(pairs)
               if n not in tables.table(t)]
    assert not missing, f"unresolved reference registry names: {missing}"


def test_specaug_lfr_band_is_one_mel_copy():
    """Freq mask band = F // (lfr_rate+1) = one mel copy, replicated at
    copy offsets (reference specaug.py:151 passes lfr_rate + 1)."""
    import jax
    import jax.numpy as jnp

    F, copies = 560, 7  # lfr_m = 7 stacked copies of 80 mels
    x = jnp.ones((1, 6, F))
    y, _ = spec_aug_lfr(jax.random.PRNGKey(5), x, jnp.array([6]),
                        apply_time_mask=False,
                        freq_mask_width_range=(10, 11), num_freq_mask=1,
                        lfr_rate=6)
    zero_cols = np.nonzero(np.asarray(y[0] == 0).all(axis=0))[0]
    assert len(zero_cols) == copies * 10  # width 10 in each of 7 copies
    per_copy = zero_cols.reshape(copies, 10) % 80
    # the SAME mel band is masked in every stacked copy
    assert (per_copy == per_copy[0]).all()
    # and the band lies inside one copy (no straddling copy boundaries)
    assert np.array_equal(per_copy[0], np.arange(per_copy[0][0],
                                                 per_copy[0][0] + 10))


def test_specaug_time_warp_skips_short_utterances():
    """Reference time_warp.py:27: utterances with L <= 2*window are
    returned unchanged (no pad frames pulled into the valid region)."""
    import jax
    import jax.numpy as jnp
    from funasr_tpu.ops.specaug import time_warp

    T = 30
    x = jnp.broadcast_to(jnp.arange(T, dtype=jnp.float32)[None, :, None],
                         (1, T, 4))
    y = time_warp(jax.random.PRNGKey(0), x, jnp.array([8]), window=5)
    np.testing.assert_allclose(np.asarray(y[0, :, 0]), np.arange(T),
                               atol=1e-5)

"""EER/minDCF metrics, scp<->jsonl converters, word tokenizer."""

import json

import numpy as np
import pytest

from funasr_tpu.metrics.spk import compute_eer, compute_min_dcf
from funasr_tpu.bin.scp2jsonl import jsonl2scp, scp2jsonl
from funasr_tpu.tokenizer.word_tokenizer import WordTokenizer


def test_eer_perfect_separation():
    scores = [0.9, 0.8, 0.7, 0.2, 0.1, 0.0]
    labels = [1, 1, 1, 0, 0, 0]
    eer, thr = compute_eer(scores, labels)
    assert eer == 0.0
    assert 0.2 < thr <= 0.7


def test_eer_random_is_half(rng):
    scores = rng.standard_normal(4000)
    labels = rng.integers(0, 2, 4000)
    eer, _ = compute_eer(scores, labels)
    assert 0.45 < eer < 0.55


def test_min_dcf_bounds(rng):
    scores = np.concatenate([rng.standard_normal(500) + 2,
                             rng.standard_normal(500)])
    labels = np.concatenate([np.ones(500), np.zeros(500)])
    dcf, _ = compute_min_dcf(scores, labels)
    assert 0.0 <= dcf <= 1.0
    # perfectly separated -> 0
    dcf0, _ = compute_min_dcf([1.0, 0.9, 0.1, 0.0], [1, 1, 0, 0])
    assert dcf0 == 0.0


def test_scp_jsonl_roundtrip(tmp_path, rng):
    import wave
    wav_path = tmp_path / "a.wav"
    with wave.open(str(wav_path), "wb") as w:
        w.setnchannels(1); w.setsampwidth(2); w.setframerate(16000)
        w.writeframes((rng.standard_normal(1600) * 1000).astype("<i2").tobytes())
    (tmp_path / "wav.scp").write_text(f"utt1 {wav_path}\nutt2 /missing.wav\n")
    (tmp_path / "text.txt").write_text("utt1 你 好\nutt2 hello world\n")
    out = tmp_path / "data.jsonl"
    n = scp2jsonl(str(tmp_path / "wav.scp"), str(out),
                  str(tmp_path / "text.txt"))
    assert n == 2
    recs = [json.loads(l) for l in out.read_text().splitlines()]
    assert recs[0]["key"] == "utt1" and recs[0]["source_len"] == 1600
    assert recs[0]["target"] == "你 好"
    assert recs[1]["source_len"] == 1  # unknown length fallback
    # round trip back to scp
    n2 = jsonl2scp(str(out), str(tmp_path / "back"))
    assert n2 == 2
    scp = (tmp_path / "back" / "wav.scp").read_text()
    assert scp.startswith("utt1 ")


def test_word_tokenizer():
    t = WordTokenizer(token_list=["<unk>", "hello", "world"])
    assert t.encode("hello world unseen") == [1, 2, 0]
    assert t.decode([1, 2]) == "hello world"
    assert t.get_vocab_size() == 3


def test_ts_prediction_lfr6_matches_reference_torch():
    """ts_prediction_lfr6_standard == reference timestamp_tools.py:31 on
    BiCif-style upsampled fire tracks (incl. the renormalization fallback,
    silence segments and the MAX_TOKEN_DURATION split)."""
    import sys
    sys.path.insert(0, "tests")
    import numpy as np
    import pytest
    torch = pytest.importorskip("torch")
    from reference_torch import load_reference

    ref_mod = load_reference("funasr.utils.timestamp_tools")
    from funasr_tpu.utils.timestamp_tools import ts_prediction_lfr6_standard

    rng = np.random.default_rng(0)
    for case in range(4):
        T = 90  # 30 LFR frames x3 upsample
        n_tok = 5
        # synth a fire track with n_tok+1 fires (cif2 fires at token starts)
        alphas = rng.uniform(0.0, 0.12, T)
        if case % 2 == 0:
            # exact fires at chosen positions
            peaks = np.zeros(T)
            pos = np.sort(rng.choice(np.arange(4, T - 6), n_tok + 1,
                                     replace=False))
            peaks[pos] = 1.0
        else:
            # fire count mismatch -> both sides renormalize alphas
            peaks = np.zeros(T)
            peaks[[10, 30]] = 1.0
        chars = [f"c{i}" for i in range(n_tok)]
        want_txt, want = ref_mod.ts_prediction_lfr6_standard(
            torch.asarray(alphas.copy()), torch.asarray(peaks.copy()),
            list(chars), vad_offset=120)
        got_txt, got = ts_prediction_lfr6_standard(
            alphas.copy(), peaks.copy(), list(chars), vad_offset=120)
        assert got == want, (case, got, want)


def test_ts_prediction_vectorized_matches_scalar_fuzz():
    """The vectorized ts_prediction_lfr6_standard (r5 host-stage
    optimization) is output-identical — ts list AND kaldi text — to the
    scalar loop transliteration across random fire tracks covering lead/
    tail silence, over-long splits, renorm fallback and fire shortfall."""
    import numpy as np

    from funasr_tpu.utils.timestamp_tools import (
        _ts_prediction_lfr6_scalar, ts_prediction_lfr6_standard)

    rng = np.random.default_rng(7)
    for case in range(200):
        T = int(rng.integers(12, 400))
        n_tok = int(rng.integers(1, max(T // 4, 2)))
        alphas = rng.uniform(0.0, 0.2, T)
        peaks = np.zeros(T)
        kind = case % 4
        if kind == 0:  # exact fire count
            k = min(n_tok + 1, T - 2)
            pos = np.sort(rng.choice(np.arange(1, T - 1), k, replace=False))
            peaks[pos] = 1.0
        elif kind == 1:  # mismatch -> renorm path
            peaks[rng.choice(T, size=min(3, T), replace=False)] = 1.0
        elif kind == 2:  # sparse fires -> long spans / splits
            k = min(n_tok + 1, max(T // 24, 2))
            pos = np.sort(rng.choice(np.arange(0, T, 12), k, replace=False))
            peaks[pos] = 1.0
            alphas[:] = 0.0  # force the no-renorm branch on mismatch
        else:  # degenerate: <2 fires, zero alphas
            if rng.random() < 0.5:
                peaks[int(rng.integers(T))] = 1.0
            alphas[:] = 0.0
        chars = [f"c{i}" for i in range(n_tok)]
        if rng.random() < 0.3:
            chars.append("</s>")
        off = int(rng.choice([0, 120, 5000]))
        want_txt, want = _ts_prediction_lfr6_scalar(
            alphas.copy(), peaks.copy(), list(chars), vad_offset=off)
        got_txt, got = ts_prediction_lfr6_standard(
            alphas.copy(), peaks.copy(), list(chars), vad_offset=off)
        assert got == want, (case, got, want)
        assert got_txt == want_txt, (case, got_txt, want_txt)
        # build_text=False returns the same spans without the string
        _, got2 = ts_prediction_lfr6_standard(
            alphas.copy(), peaks.copy(), list(chars), vad_offset=off,
            build_text=False)
        assert got2 == want


def test_ts_prediction_batch_matches_single_fuzz():
    """ts_prediction_lfr6_batch (one vectorized fire pass per ASR batch —
    the pipeline asr_host stage) is row-for-row EXACTLY equal to per-row
    ts_prediction_lfr6_standard on the padded grid sliced by us_lens,
    across refire/no-refire/degenerate/zero-alpha/</s>/empty rows."""
    import numpy as np

    from funasr_tpu.utils.timestamp_tools import (
        ts_prediction_lfr6_batch, ts_prediction_lfr6_standard)

    rng = np.random.default_rng(11)
    for case in range(40):
        B = int(rng.integers(1, 9))
        T = int(rng.integers(24, 300))
        alphas = rng.uniform(0.0, 0.2, (B, T))
        peaks = np.zeros((B, T))
        lens = rng.integers(12, T + 1, B)
        toks, offs = [], []
        for i in range(B):
            m = int(lens[i])
            n_tok = int(rng.integers(0, max(m // 4, 2)))
            kind = (case + i) % 5
            if kind == 0 and n_tok:  # exact fire count inside [:m]
                k = min(n_tok + 1, m - 2)
                if k > 0:
                    pos = np.sort(rng.choice(np.arange(1, m - 1), k,
                                             replace=False))
                    peaks[i, pos] = 1.0
            elif kind == 1:  # mismatch -> batched renorm refire
                peaks[i, rng.choice(m, size=min(3, m), replace=False)] = 1.0
            elif kind == 2:  # sparse -> over-long splits, no renorm
                pos = np.arange(0, m, 13)[: max(n_tok + 1, 2)]
                peaks[i, pos] = 1.0
                alphas[i] = 0.0
            elif kind == 3:  # degenerate <2 fires
                if rng.random() < 0.5:
                    peaks[i, int(rng.integers(m))] = 1.0
                alphas[i] = 0.0
            # kind 4: no fires at all, alphas drive the refire
            # padding beyond us_lens must be IGNORED: poison it
            peaks[i, m:] = 1.0
            chars = [f"c{j}" for j in range(n_tok)]
            if rng.random() < 0.3:
                chars.append("</s>")
            toks.append(chars)
            offs.append(int(rng.choice([0, 120, 5000])))
        got = ts_prediction_lfr6_batch(alphas, peaks, toks, lens, offs)
        for i in range(B):
            m = int(lens[i])
            _, want = ts_prediction_lfr6_standard(
                alphas[i, :m].copy(), peaks[i, :m].copy(), list(toks[i]),
                vad_offset=offs[i], build_text=False)
            assert got[i] == want, (case, i, got[i], want)


def test_split_words_regex_matches_loop():
    """The regex split_words == the reference per-char loop, including the
    U+3000 ideographic-space separator case."""
    from funasr_tpu.models.ct_transformer.model import split_words

    def loop_form(text):
        out = []
        for chunk in text.strip().split():
            buf = ""
            for ch in chunk:
                if "一" <= ch <= "鿿" or "　" <= ch <= "〿":
                    if buf:
                        out.append(buf)
                        buf = ""
                    out.append(ch)
                else:
                    buf += ch
            if buf:
                out.append(buf)
        return out

    cases = [
        "你好世界",
        "hello world",
        "我的name是bob的」朋友",
        "abc你 好def  ghi。",
        "mixed　ideographic　space与ascii",  # U+3000 separators
        "、标点〿边界",
        "",
        "   ",
        "a",
        "tail你",
    ]
    for text in cases:
        assert split_words(text) == loop_form(text), text


def test_sentence_postprocess_cjk_fast_path():
    """The single-CJK-char fast path returns exactly what the loop form
    returns (text, kept timestamps, words)."""
    from funasr_tpu.utils.postprocess import sentence_postprocess

    toks = list("你好世界")
    ts = [[0, 60], [60, 120], [120, 180], [180, 240]]
    text, kept, words = sentence_postprocess(toks, ts)
    assert text == "你好世界" and kept == ts and words == toks
    # non-CJK falls back to the loop (spacing + BPE merge)
    text2, words2 = sentence_postprocess(["he@@", "llo", "你"])
    assert text2 == "hello你" and words2 == ["hello", "你"]
    # specials dropped on the loop path
    text3, words3 = sentence_postprocess(["<s>", "你", "</s>"])
    assert text3 == "你" and words3 == ["你"]
    # mixed single chars (one ascii) must NOT take the fast path
    text4, words4 = sentence_postprocess(list("你a好"))
    assert text4 == "你 a好"


def test_token_list_gbk_transcoding(tmp_path):
    """GBK-encoded vocab files load transparently (reference runtime
    encode_converter.cpp X_GBK2UTF8 role)."""
    from funasr_tpu.tokenizer.char_tokenizer import load_token_list

    toks = ["<blank>", "你", "好", "世", "界"]
    utf8 = tmp_path / "vocab_utf8.txt"
    utf8.write_text("\n".join(toks), encoding="utf-8")
    gbk = tmp_path / "vocab_gbk.txt"
    gbk.write_bytes("\n".join(toks).encode("gbk"))
    assert load_token_list(str(utf8)) == toks
    assert load_token_list(str(gbk)) == toks

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

"""DefaultFrontend, phoneme tokenizer, sensevoice2jsonl."""

import json

import numpy as np
import jax.numpy as jnp
import pytest

from funasr_tpu.frontends.default import DefaultFrontend
from funasr_tpu.tokenizer.phoneme_tokenizer import PhonemeTokenizer


def test_default_frontend_shapes(rng):
    fe = DefaultFrontend(n_fft=512, hop_length=128, n_mels=40)
    wav = jnp.asarray(rng.standard_normal((2, 2560)), jnp.float32)
    lens = jnp.array([2560, 1280], jnp.int32)
    feats, flens = fe(wav, lens)
    assert feats.shape == (2, 2560 // 128 + 1, 40)
    assert flens.tolist() == [21, 11]
    assert np.isfinite(np.asarray(feats)).all()
    # louder signal -> larger log-mel energy
    feats2, _ = fe(wav * 10, lens)
    assert float(feats2.mean()) > float(feats.mean())


def test_phoneme_tokenizer():
    t = PhonemeTokenizer(
        token_list=["<unk>", "HH", "AH", "L", "OW", "a", "b"],
        lexicon={"hello": ["HH", "AH", "L", "OW"]})
    assert t.text2tokens("hello") == ["HH", "AH", "L", "OW"]
    assert t.text2tokens("ab") == ["a", "b"]  # letter fallback
    assert t.text2tokens("xyz") == ["<unk>"]
    assert t.decode(t.encode("hello")) == "HH AH L OW"


def test_sensevoice2jsonl(tmp_path):
    from funasr_tpu.bin.sensevoice2jsonl import sensevoice2jsonl

    (tmp_path / "wav.scp").write_text("u1 /a.wav\n")
    (tmp_path / "text.txt").write_text("u1 你好\n")
    (tmp_path / "lid.txt").write_text("u1 <|en|>\n")
    out = tmp_path / "sv.jsonl"
    n = sensevoice2jsonl(str(tmp_path / "wav.scp"),
                         str(tmp_path / "text.txt"), str(out),
                         lid_file=str(tmp_path / "lid.txt"))
    assert n == 1
    rec = json.loads(out.read_text())
    assert rec["text_language"] == "<|en|>"
    assert rec["emo_target"] == "<|NEUTRAL|>"
    assert rec["with_or_wo_itn"] == "<|woitn|>"

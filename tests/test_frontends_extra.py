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


def test_default_frontend_matches_torch_stft_slaney():
    """DefaultFrontend == torch.stft(periodic hann, reflect center) +
    librosa Slaney mel (reference frontends/utils/log_mel.py:49)."""
    import numpy as np
    import pytest
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp
    from funasr_tpu.frontends.default import stft_log_mel
    from funasr_tpu.frontends.whisper_frontend import _slaney_mel_banks

    wav = np.random.default_rng(0).standard_normal(4000).astype(
        np.float32) * 0.1
    n_fft, hop = 512, 128
    t = torch.stft(torch.from_numpy(wav), n_fft, hop,
                   window=torch.hann_window(n_fft), center=True,
                   pad_mode="reflect", return_complex=True)
    power = (t.abs() ** 2).numpy().T
    want = np.log(np.maximum(
        power @ _slaney_mel_banks(80, n_fft, 16000).T, 1e-10))
    feats, _ = stft_log_mel(jnp.asarray(wav[None]), jnp.asarray([4000]))
    got = np.asarray(feats[0])
    T = min(len(want), got.shape[0])
    np.testing.assert_allclose(got[:T], want[:T], atol=2e-3)


def test_mel23_frontend_shapes_and_semantics():
    """WavFrontendMel23 (EEND-OLA): stft conventions, slaney mel bank,
    splice/subsample — reference wav_frontend.py:500."""
    import numpy as np

    from funasr_tpu.frontends.mel23 import (WavFrontendMel23,
                                            mel_filterbank, splice, stft,
                                            transform)
    from funasr_tpu.registry import tables

    assert tables.get("frontend_classes", "WavFrontendMel23") \
        is WavFrontendMel23

    rng = np.random.default_rng(0)
    # mel bank: librosa conventions — shape, nonnegative, slaney norm
    # makes filter areas equal (sum_k w[m,k] * df is ~constant)
    fb = mel_filterbank(8000, 1024, 23)
    assert fb.shape == (23, 513)
    assert (fb >= 0).all()
    areas = fb.sum(axis=1)
    # equal-area within a few % (grid quantization)
    assert areas.std() / areas.mean() < 0.05

    # stft: trailing-frame trim exactly when len % shift == 0
    # (centered frames = 1 + len//hop; the trim removes one)
    w = rng.standard_normal(2561)
    s1 = stft(w[:2560], 1024, 256)   # divisible -> 11 - 1 = 10 frames
    s2 = stft(w, 1024, 256)          # not divisible -> 11 frames
    assert s1.shape[1] == 513
    assert (s1.shape[0], s2.shape[0]) == (10, 11)

    # transform: per-utterance zero mean
    m = transform(s1)
    np.testing.assert_allclose(m.mean(axis=0), 0.0, atol=1e-4)
    assert m.shape == (s1.shape[0], 23)

    # splice context layout: [t-c .. t .. t+c] blocks
    Y = np.arange(12, dtype=np.float32).reshape(4, 3)
    sp = splice(Y, 1)
    assert sp.shape == (4, 9)
    np.testing.assert_array_equal(sp[1], np.concatenate([Y[0], Y[1], Y[2]]))
    np.testing.assert_array_equal(sp[0][:3], 0)  # zero left pad

    fe = WavFrontendMel23(lfr_m=2, lfr_n=2)
    assert fe.output_size() == 23 * 5
    wavs = np.stack([rng.standard_normal(4000),
                     np.pad(rng.standard_normal(2000), (0, 2000))])
    feats, flens = fe(wavs, np.array([4000, 2000]))
    assert feats.shape[0] == 2 and feats.shape[2] == 115
    assert flens[1] < flens[0]

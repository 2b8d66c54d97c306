"""Export bundle tests: StableHLO servable round-trip (reference
funasr-export / auto_model.py:675 parity — TPU-native artifact)."""

import numpy as np
import pytest

from funasr_tpu.auto.auto_model import AutoModel
from funasr_tpu.auto.export import load_servable

VOCAB = ["<blank>", "<s>", "</s>"] + list("我们今天去公园玩吧好的")

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


def _wav(rng, secs=2.0):
    n = int(16000 * secs)
    return (0.3 * np.sin(2 * np.pi * 220 * np.arange(n) / 16000)
            + 0.01 * rng.standard_normal(n)).astype(np.float32)


def test_export_roundtrip(tmp_path, rng):
    am = AutoModel(model=ASR_CFG)
    out = str(tmp_path / "bundle")
    meta = am.export(out, batch_sizes=(2,), seconds=(4,))
    assert len(meta["buckets"]) == 1

    srv = load_servable(out)
    wavs = [_wav(rng, 2.0), _wav(rng, 1.0)]
    tokens, tok_lens = srv(wavs)
    assert tokens.shape[0] == 2 and tok_lens.shape == (2,)

    # parity with the live engine at the same padded shape
    import jax.numpy as jnp
    wav = np.zeros((2, 4 * 16000), np.float32)
    lens = np.zeros((2,), np.int32)
    for i, w in enumerate(wavs):
        wav[i, : len(w)] = w
        lens[i] = len(w)
    live_toks, live_lens = am.engine.decode_fn(
        am.engine.params, jnp.asarray(wav), jnp.asarray(lens))
    np.testing.assert_array_equal(np.asarray(live_lens), tok_lens)
    for i in range(2):
        n = int(tok_lens[i])
        np.testing.assert_array_equal(
            np.asarray(live_toks)[i, :n], tokens[i, :n])

    # bundle reloads through AutoModel too (model.npz + config.yaml)
    am2 = AutoModel(model=out)
    res = am2.generate([wavs[0]], key=["k"])
    assert res[0]["key"] == "k"


def test_export_cli(tmp_path, rng, monkeypatch):
    import yaml
    from funasr_tpu.bin.export import main

    cfg_path = tmp_path / "cfg.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(ASR_CFG, f, allow_unicode=True)
    out = str(tmp_path / "bundle")
    main(["--model", str(cfg_path), "--output-dir", out,
          "--batch-sizes", "1", "--seconds", "2"])
    srv = load_servable(out)
    tokens, tok_lens = srv([_wav(rng, 1.0)])
    assert tokens.shape[0] == 1

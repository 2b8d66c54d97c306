"""CLI end-to-end tests: funasr-tpu-train on a tiny corpus, then funasr-tpu
inference on the artifacts, plus WER metric checks."""

import json
import os
import wave

import numpy as np
import pytest
import yaml

from funasr_tpu.metrics.wer import cer_from_text, compute_wer, edit_distance

VOCAB = ["<blank>", "<s>", "</s>"] + list("你好世界我们")


def test_edit_distance():
    d = edit_distance(list("abcd"), list("abxd"))
    assert d == {"sub": 1, "ins": 0, "del": 0, "cor": 3, "ref_len": 4}
    d = edit_distance(list("abc"), list("abcd"))
    assert d["ins"] == 1 and d["cor"] == 3
    d = edit_distance(list("abc"), list("ac"))
    assert d["del"] == 1


def test_compute_wer_corpus():
    refs = {"u1": list("你好世界"), "u2": list("我们")}
    hyps = {"u1": list("你好世界"), "u2": list("我")}
    out = compute_wer(refs, hyps)
    assert out["wer"] == pytest.approx(1 / 6)
    assert cer_from_text("你 好", "你好") == 0.0


def _write_corpus(tmp_path, rng, n=6):
    recs = []
    for i in range(n):
        ns = 4000 + 1600 * i
        data = (0.3 * np.sin(2 * np.pi * (200 + 30 * i) * np.arange(ns) / 16000)
                ).astype(np.float32)
        p = tmp_path / f"u{i}.wav"
        with wave.open(str(p), "wb") as w:
            w.setnchannels(1); w.setsampwidth(2); w.setframerate(16000)
            w.writeframes((data * 32767).astype("<i2").tobytes())
        tgt = "你 好 世 界"[: 2 * ((i % 4) + 1)].strip()
        recs.append(dict(key=f"u{i}", source=str(p), target=tgt,
                         source_len=ns, target_len=len(tgt.split())))
    jsonl = tmp_path / "train.jsonl"
    with open(jsonl, "w", encoding="utf-8") as f:
        for r in recs:
            f.write(json.dumps(r, ensure_ascii=False) + "\n")
    return jsonl, recs


@pytest.mark.slow
def test_train_then_infer_cli(tmp_path, rng):
    from funasr_tpu.bin import inference as infer_cli
    from funasr_tpu.bin import train as train_cli

    jsonl, recs = _write_corpus(tmp_path, rng)
    cfg = dict(
        model="Paraformer",
        tokenizer="CharTokenizer",
        tokenizer_conf=dict(token_list=VOCAB, split_with_space=True),
        frontend_conf=dict(n_mels=20, lfr_m=3, lfr_n=2),
        input_size=60,
        encoder_conf=dict(output_size=16, attention_heads=2, linear_units=32,
                          num_blocks=2, kernel_size=5, dropout_rate=0.0),
        decoder_conf=dict(attention_heads=2, linear_units=32, num_blocks=1,
                          att_layer_num=1, kernel_size=5, dropout_rate=0.0),
        predictor_conf=dict(idim=16, tail_threshold=0.45, dropout=0.0),
        dataset_conf=dict(batch_type="example", batch_size=3),
        train_conf=dict(max_epoch=2, log_interval=2,
                        save_checkpoint_interval=100, grad_clip=5.0),
        optim="adam", optim_conf=dict(lr=1e-3),
        scheduler="constant", scheduler_conf={},
    )
    cfg_path = tmp_path / "config.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg, allow_unicode=True))
    out_dir = tmp_path / "exp"

    state = train_cli.main([
        "--config", str(cfg_path),
        "--train-jsonl", str(jsonl),
        "--output-dir", str(out_dir),
        "--max-epoch", "1",
    ])
    assert int(state.step) > 0
    assert (out_dir / "model.avg.npz").exists()

    # inference CLI: load the averaged weights back
    infer_cfg = dict(cfg)
    infer_cfg["init_param"] = str(out_dir / "model.avg.npz")
    infer_cfg_path = tmp_path / "infer.yaml"
    infer_cfg_path.write_text(yaml.safe_dump(infer_cfg, allow_unicode=True))
    out2 = tmp_path / "decode"
    results = infer_cli.main([
        "--model", str(infer_cfg_path),
        "--input", recs[0]["source"], recs[1]["source"],
        "--output-dir", str(out2),
    ])
    assert len(results) == 2
    assert (out2 / "text").exists()


@pytest.mark.slow
def test_train_cli_pipeline_parallel(tmp_path, rng):
    """--pipeline-parallel N: the CLI train step runs dp x pp (GPipe over
    the scanned encoder) and produces finite losses/checkpoints."""
    from funasr_tpu.bin import train as train_cli
    from funasr_tpu.parallel import pp

    jsonl, recs = _write_corpus(tmp_path, rng)
    cfg = dict(
        model="Paraformer",
        tokenizer="CharTokenizer",
        tokenizer_conf=dict(token_list=VOCAB, split_with_space=True),
        frontend_conf=dict(n_mels=20, lfr_m=3, lfr_n=2),
        input_size=60,
        encoder_conf=dict(output_size=16, attention_heads=2,
                          linear_units=32, num_blocks=3, kernel_size=5,
                          dropout_rate=0.0),
        decoder_conf=dict(attention_heads=2, linear_units=32, num_blocks=1,
                          att_layer_num=1, kernel_size=5, dropout_rate=0.0),
        predictor_conf=dict(idim=16, tail_threshold=0.45, dropout=0.0),
        dataset_conf=dict(batch_type="example", batch_size=4),
        train_conf=dict(max_epoch=1, log_interval=2,
                        save_checkpoint_interval=100, grad_clip=5.0),
        optim="adam", optim_conf=dict(lr=1e-3),
        scheduler="constant", scheduler_conf={},
    )
    cfg_path = tmp_path / "config.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg, allow_unicode=True))
    try:
        state = train_cli.main([
            "--config", str(cfg_path),
            "--train-jsonl", str(jsonl),
            "--output-dir", str(tmp_path / "exp_pp"),
            "--model-parallel", "2",
            "--pipeline-parallel", "2",
            "--max-epoch", "1",
        ])
    finally:
        pp.disable()
    assert int(state.step) > 0


def test_tokenize_text_cli(tmp_path):
    """funasr-tpu-tokenize-text: token stream + vocabulary building with
    pinned symbols (reference funasr/bin/tokenize_text.py)."""
    from funasr_tpu.bin import tokenize_text as tt

    src = tmp_path / "text"
    src.write_text("utt1 你好 世界\nutt2 你好 朋友\n", encoding="utf-8")

    out = tmp_path / "tokens"
    tt.main(["--input", str(src), "--output", str(out),
             "--token_type", "char", "--field", "2-"])
    lines = out.read_text(encoding="utf-8").splitlines()
    assert lines[0].split() == ["你", "好", "世", "界"]

    vocab = tmp_path / "vocab"
    tt.main(["--input", str(src), "--output", str(vocab),
             "--token_type", "char", "--field", "2-",
             "--write_vocabulary",
             "--add_symbol", "<blank>:0", "--add_symbol", "<unk>:1",
             "--add_symbol", "<sos/eos>:-1"])
    v = vocab.read_text(encoding="utf-8").splitlines()
    assert v[0] == "<blank>" and v[1] == "<unk>" and v[-1] == "<sos/eos>"
    # 你/好 occur twice -> sorted first among real tokens
    assert set(v[2:4]) == {"你", "好"}
    assert "世" in v and "朋" in v

"""Every AISHELL recipe config builds + decodes through AutoModel.

The reference's de-facto regression harness is its example recipes
(SURVEY §4); this pins the TPU recipes' configs at tiny dims so a
registry/constructor change can't silently break a family's YAML shape.
"""

import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY = {
    "conformer/conf/conformer_12e_6d_2048_256.yaml":
        dict(encoder_conf=dict(num_blocks=2, output_size=32,
                               linear_units=64, attention_heads=2,
                               cnn_module_kernel=7),
             decoder_conf=dict(num_blocks=1, linear_units=64,
                               attention_heads=2)),
    "conformer/conf/conformer_rwkv.yaml":
        dict(encoder_conf=dict(num_blocks=2, output_size=32,
                               linear_units=64, attention_heads=2,
                               cnn_module_kernel=7),
             decoder_conf=dict(num_blocks=1, linear_units=64,
                               attention_heads=2)),
    "transformer/conf/transformer_12e_6d_2048_256.yaml":
        dict(encoder_conf=dict(num_blocks=2, output_size=32,
                               linear_units=64, attention_heads=2),
             decoder_conf=dict(num_blocks=1, linear_units=64,
                               attention_heads=2)),
    "branchformer/conf/branchformer_12e_6d_2048_256.yaml":
        dict(encoder_conf=dict(num_blocks=2, output_size=32,
                               cgmlp_linear_units=64, attention_heads=2),
             decoder_conf=dict(num_blocks=1, linear_units=64,
                               attention_heads=2)),
    "e_branchformer/conf/e_branchformer_12e_6d_2048_256.yaml":
        dict(encoder_conf=dict(num_blocks=2, output_size=32,
                               cgmlp_linear_units=64, linear_units=64,
                               attention_heads=2),
             decoder_conf=dict(num_blocks=1, linear_units=64,
                               attention_heads=2)),
    "e_paraformer/conf/e_paraformer_conformer_12e_6d_2048_256.yaml":
        dict(encoder_conf=dict(num_blocks=2, output_size=32,
                               linear_units=64, attention_heads=2,
                               kernel_size=5),
             decoder_conf=dict(num_blocks=1, att_layer_num=1,
                               linear_units=64, attention_heads=2),
             predictor_conf=dict(idim=32, sigma_heads=2),
             input_size=60,
             frontend_conf=dict(fs=16000, n_mels=20, lfr_m=3, lfr_n=2)),
    "paraformer/conf/paraformer_conformer_12e_6d_2048_256.yaml":
        dict(encoder_conf=dict(num_blocks=2, output_size=32,
                               linear_units=64, attention_heads=2,
                               kernel_size=7),
             decoder_conf=dict(num_blocks=1, linear_units=64,
                               attention_heads=2),
             predictor_conf=dict(idim=32),
             input_size=60,
             frontend_conf=dict(fs=16000, n_mels=20, lfr_m=3, lfr_n=2)),
}


@pytest.mark.slow
@pytest.mark.parametrize("rel", sorted(TINY))
def test_aishell_config_builds_and_decodes(rel, rng):
    from funasr_tpu.auto.auto_model import AutoModel
    from funasr_tpu.config import deep_update, load_config

    path = os.path.join(REPO, "examples", "aishell", rel)
    cfg = load_config(path)
    deep_update(cfg, dict(
        vocab_size=20,
        tokenizer_conf={"token_list": ["<blank>", "<s>", "</s>"]
                        + list("一二三四五六七八九十口天地人心")},
        **TINY[rel]))
    if "lfr_m: 1" in open(path).read():
        cfg["frontend_conf"] = dict(fs=16000, n_mels=20, lfr_m=1, lfr_n=1)
        cfg["input_size"] = 20
    am = AutoModel(model=cfg)
    wav = (0.3 * np.sin(2 * np.pi * 220 * np.arange(12000) / 16000)
           ).astype(np.float32)
    res = am.generate([wav])
    assert res and "text" in res[0]

"""Torch-name state_dict -> flax tree conversion: structural + runtime check."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from funasr_tpu.convert import check_tree_matches, paraformer_from_torch
from funasr_tpu.models.paraformer.model import Paraformer

V, D, H, FF, IN = 32, 16, 2, 32, 24
N_ENC, N_DEC = 3, 2
K_ENC, K_DEC = 5, 5


def _torch_style_state_dict(rng):
    """Random state_dict using the reference's parameter naming
    (paraformer/model.py + sanm modules), shapes for the tiny config."""
    sd = {}

    def lin(p, i, o, bias=True):
        sd[f"{p}.weight"] = rng.standard_normal((o, i)).astype(np.float32) * 0.05
        if bias:
            sd[f"{p}.bias"] = rng.standard_normal((o,)).astype(np.float32) * 0.01

    def norm(p, d):
        sd[f"{p}.weight"] = np.ones((d,), np.float32)
        sd[f"{p}.bias"] = np.zeros((d,), np.float32)

    def enc_layer(p, in_d):
        lin(f"{p}.self_attn.linear_q_k_v", in_d, 3 * D)
        lin(f"{p}.self_attn.linear_out", D, D)
        sd[f"{p}.self_attn.fsmn_block.weight"] = (
            rng.standard_normal((D, 1, K_ENC)).astype(np.float32) * 0.05
        )
        # FFN operates at `size` even in the first (in_size->size) layer:
        # the attention block does the width change (sanm/encoder.py:120-137)
        lin(f"{p}.feed_forward.w_1", D, FF)
        lin(f"{p}.feed_forward.w_2", FF, D)
        norm(f"{p}.norm1", in_d)
        norm(f"{p}.norm2", D)

    enc_layer("encoder.encoders0.0", IN)
    for i in range(N_ENC - 1):
        enc_layer(f"encoder.encoders.{i}", D)
    norm("encoder.after_norm", D)

    sd["predictor.cif_conv1d.weight"] = (
        rng.standard_normal((D, D, 3)).astype(np.float32) * 0.05
    )
    sd["predictor.cif_conv1d.bias"] = np.zeros((D,), np.float32)
    lin("predictor.cif_output", D, 1)

    def dec_layer(p, has_self=True, has_src=True):
        lin(f"{p}.feed_forward.w_1", D, FF)
        lin(f"{p}.feed_forward.w_2", FF, D, bias=False)
        norm(f"{p}.feed_forward.norm", FF)
        norm(f"{p}.norm1", D)
        if has_self:
            sd[f"{p}.self_attn.fsmn_block.weight"] = (
                rng.standard_normal((D, 1, K_DEC)).astype(np.float32) * 0.05
            )
            norm(f"{p}.norm2", D)
        if has_src:
            lin(f"{p}.src_attn.linear_q", D, D)
            lin(f"{p}.src_attn.linear_k_v", D, 2 * D)
            lin(f"{p}.src_attn.linear_out", D, D)
            norm(f"{p}.norm3", D)

    for i in range(N_DEC):
        dec_layer(f"decoder.decoders.{i}")
    dec_layer("decoder.decoders3.0", has_self=False, has_src=False)
    norm("decoder.after_norm", D)
    lin("decoder.output_layer", D, V)
    sd["decoder.embed.0.weight"] = rng.standard_normal((V, D)).astype(np.float32) * 0.05
    return sd


@pytest.fixture
def tiny_model():
    return Paraformer(
        vocab_size=V,
        input_size=IN,
        encoder_conf=dict(output_size=D, attention_heads=H, linear_units=FF,
                          num_blocks=N_ENC, kernel_size=K_ENC, dropout_rate=0.0),
        decoder_conf=dict(attention_heads=H, linear_units=FF, num_blocks=N_DEC,
                          att_layer_num=N_DEC, kernel_size=K_DEC,
                          dropout_rate=0.0),
        predictor_conf=dict(idim=D, l_order=1, r_order=1, tail_threshold=0.45,
                            dropout=0.0),
    )


def test_convert_structure_and_run(tiny_model, rng):
    sd = _torch_style_state_dict(rng)
    converted = paraformer_from_torch(sd)

    key = jax.random.PRNGKey(0)
    speech = jnp.asarray(rng.standard_normal((2, 30, IN)), jnp.float32)
    slens = jnp.array([30, 22])
    text = jnp.asarray(rng.integers(3, V, (2, 6)), jnp.int32)
    tlens = jnp.array([6, 4])
    # init through the training path so every param (incl. sampler embed)
    # exists in the reference tree
    init = tiny_model.init({"params": key, "dropout": key, "sampler": key},
                           speech, slens, text, tlens)
    problems = check_tree_matches(converted, init)
    assert problems == []

    converted = jax.tree_util.tree_map(jnp.asarray, converted)
    tokens, lens, scores = tiny_model.apply(
        converted, speech, slens, max_tokens=12, method=tiny_model.greedy_decode
    )
    assert np.isfinite(np.asarray(scores)).all()


def test_convert_linear_transpose(rng):
    sd = _torch_style_state_dict(rng)
    converted = paraformer_from_torch(sd)
    w_torch = sd["decoder.output_layer.weight"]  # (V, D)
    w_jax = converted["params"]["decoder"]["output_layer"]["kernel"]  # (D, V)
    np.testing.assert_array_equal(w_jax, w_torch.T)
    # fsmn depthwise layout (D,1,K) -> (K,1,D)
    f_t = sd["encoder.encoders0.0.self_attn.fsmn_block.weight"]
    f_j = converted["params"]["encoder"]["encoders0"]["self_attn"]["fsmn_block"]
    np.testing.assert_array_equal(f_j, np.transpose(f_t, (2, 1, 0)))
    # scanned stack leaf: (L, ...) layout
    stack = converted["params"]["encoder"]["encoders"]["self_attn"]["linear_q_k_v"]["kernel"]
    assert stack.shape[0] == N_ENC - 1


def test_detect_arch_fingerprints():
    from funasr_tpu.convert import detect_arch

    assert detect_arch({"seaco_decoder.after_norm.weight": 0}) \
        == "seaco_paraformer"
    assert detect_arch({"decoder.bias_decoder.norm3.weight": 0}) \
        == "contextual_paraformer"
    assert detect_arch({"encoder2.after_norm.weight": 0}) == "uniasr"
    assert detect_arch({"joint_network.lin_enc.weight": 0}) == "transducer"
    assert detect_arch({"modality_encoders.AUDIO.extra_tokens": 0}) \
        == "emotion2vec"
    assert detect_arch({"mask_net.conv1d_encoder.weight": 0}) == "mossformer"
    assert detect_arch({"encoder.tp_encoders.0.norm1.weight": 0}) \
        == "sense_voice"
    assert detect_arch({"xvector.tdnn.linear.weight": 0}) == "campplus"
    assert detect_arch({"layer1_downsample.weight": 0}) == "eres2net"
    assert detect_arch({"in_linear1.linear.weight": 0}) == "fsmn_vad"
    assert detect_arch({"encoder.in_linear1.linear.weight": 0,
                        "ctc.ctc_lo.weight": 0}) == "fsmn_kws"
    assert detect_arch({"embed.weight": 0, "decoder.weight": 0}) \
        == "ct_transformer"
    assert detect_arch({"predictor.upsample_cnn.weight": 0}) \
        == "monotonic_aligner"
    assert detect_arch({"predictor.upsample_cnn.weight": 0,
                        "decoder.after_norm.weight": 0}) \
        == "bicif_paraformer"
    assert detect_arch({"encoder.encoders.0.self_attn.linear_q_k_v.weight":
                        0}) == "paraformer"
    assert detect_arch(
        {"encoder.encoders.0.self_attn.linear_pos.weight": 0}) == "conformer"

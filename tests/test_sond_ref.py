"""Reference-architecture SOND: converter + logit parity vs the actual
reference torch modules (sond/e2e_diar_sond.py prediction_forward)."""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, "tests")
torch = pytest.importorskip("torch")

from reference_torch import load_reference  # noqa: E402

FEAT, PROF_D, D, MAXSPK, V = 16, 16, 16, 4, 12


def _ref_model(sp_l2reg=True):
    e2e = load_reference("funasr.models.sond.e2e_diar_sond")
    rn = load_reference("funasr.models.sond.encoder.resnet34_encoder")
    san = load_reference("funasr.models.sond.encoder.self_attention_encoder")
    fsmn = load_reference("funasr.models.sond.encoder.fsmn_encoder")
    ci = load_reference("funasr.models.sond.encoder.ci_scorers")
    torch.manual_seed(11)
    cls = rn.ResNet34SpL2RegDiar if sp_l2reg else rn.ResNet34Diar
    enc = cls(FEAT, embedding_node="resnet1_dense",
              num_nodes_pooling_layer=24, layers_in_block=(1, 1, 1, 1),
              filters_in_block=(4, 6, 8, 12), num_nodes_resnet1=D,
              num_nodes_last_layer=D, pool_size=6, stride=1)
    spk = san.SelfAttentionEncoder(
        PROF_D, output_size=D, attention_heads=2, linear_units=24,
        num_blocks=1, input_layer=None, dropout_rate=0.0,
        positional_dropout_rate=0.0, attention_dropout_rate=0.0)
    cd = san.SelfAttentionEncoder(
        2 * D, output_size=D, attention_heads=2, linear_units=24,
        num_blocks=2, input_layer="null", dropout_rate=0.0,
        positional_dropout_rate=0.0, attention_dropout_rate=0.0,
        out_units=1)
    post = fsmn.FsmnEncoder(2 * MAXSPK, filter_size=5, fsmn_num_layers=2,
                            dnn_num_layers=1, num_memory_units=24,
                            ffn_inner_dim=32, dropout_rate=0.0,
                            out_units=V)
    token_list = [str(i) for i in range(V)]
    model = e2e.DiarSondModel(
        vocab_size=V, frontend=None, specaug=None, profileaug=None,
        normalize=None, encoder=enc, speaker_encoder=spk,
        ci_scorer=ci.CosScorer(), cd_scorer=cd, decoder=post,
        token_list=token_list, max_spk_num=MAXSPK)
    model.eval()
    return model


def _ours(ref, sp_l2reg=True):
    from funasr_tpu.convert import sond_from_torch
    from funasr_tpu.models.sond.reference_arch import DiarSondModel

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    m = DiarSondModel(
        token_list=list(range(V)), max_spk_num=MAXSPK,
        speech_encoder_conf=dict(
            input_size=FEAT, sp_l2reg=sp_l2reg,
            num_nodes_pooling_layer=24, layers_in_block=(1, 1, 1, 1),
            filters_in_block=(4, 6, 8, 12), num_nodes_resnet1=D,
            num_nodes_last_layer=D, embedding_node="resnet1_dense",
            pool_size=6, stride=1),
        speaker_encoder_conf=dict(input_size=PROF_D, output_size=D,
                                  attention_heads=2, linear_units=24,
                                  num_blocks=1, input_layer=None),
        cd_scorer_conf=dict(input_size=2 * D, output_size=D,
                            attention_heads=2, linear_units=24,
                            num_blocks=2, input_layer="null", out_units=1),
        post_net_conf=dict(in_units=2 * MAXSPK, filter_size=5,
                           fsmn_num_layers=2, dnn_num_layers=1,
                           num_memory_units=24, ffn_inner_dim=32,
                           out_units=V),
        ci_scorer="cos")
    m.params = sond_from_torch(sd)
    return m


@pytest.mark.parametrize("sp_l2reg", [True, False])
def test_sond_prediction_parity(sp_l2reg):
    """prediction logits == reference prediction_forward (eval mode, both
    resnet variants)."""
    ref = _ref_model(sp_l2reg)
    ours = _ours(ref, sp_l2reg)
    rng = np.random.default_rng(0)
    B, T = 2, 24
    speech = rng.standard_normal((B, T, FEAT)).astype(np.float32)
    lens = np.asarray([T, T], np.int64)
    # profiles arrive padded to max_spk_num with zero rows for empty
    # slots (the reference's norm>0 profile_mask handles them); lengths
    # equal the padded count — the reference speaker encoder's pad-mask
    # is built from lengths and crashes on anything shorter
    profile = rng.standard_normal((B, MAXSPK, PROF_D)).astype(np.float32)
    profile[0, 3] = 0.0
    profile[1, 2:] = 0.0
    plens = np.asarray([MAXSPK, MAXSPK], np.int64)
    with torch.no_grad():
        want = ref.prediction_forward(
            torch.from_numpy(speech), torch.from_numpy(lens),
            torch.from_numpy(profile), torch.from_numpy(plens)).numpy()
    got, olens = ours.prediction(speech, lens, profile, plens)
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_sond_diarize_binary_decode():
    """diarize() returns per-speaker binary grids decoded from the PSE
    code bits in token_list."""
    ref = _ref_model()
    ours = _ours(ref)
    rng = np.random.default_rng(1)
    speech = rng.standard_normal((1, 24, FEAT)).astype(np.float32)
    profile = rng.standard_normal((1, 3, PROF_D)).astype(np.float32)
    out = ours.diarize(speech, np.asarray([24]), profile, np.asarray([3]))
    assert out[0].shape[1] == MAXSPK
    assert set(np.unique(out[0])) <= {0.0, 1.0}


def test_sond_loss_finite():
    ref = _ref_model()
    ours = _ours(ref)
    rng = np.random.default_rng(2)
    speech = rng.standard_normal((2, 24, FEAT)).astype(np.float32)
    profile = rng.standard_normal((2, 3, PROF_D)).astype(np.float32)
    logits, olens = ours.prediction(speech, np.asarray([24, 24]), profile,
                                    np.asarray([3, 3]))
    labels = rng.integers(0, V, size=(2, logits.shape[1]))
    loss = ours.loss(ours.params, speech, np.asarray([24, 24]), profile,
                     np.asarray([3, 3]), labels)
    assert np.isfinite(float(loss))

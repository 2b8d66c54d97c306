"""Logit-level parity vs the ACTUAL reference torch implementation.

Builds a tiny reference Paraformer (torch, /root/reference, eval mode),
converts its state_dict through funasr_tpu.convert, and checks encoder
outputs, CIF predictor outputs, and decoder log-probs agree with our JAX
implementation on the same inputs — the strongest correctness evidence
available without model-hub weights (zero egress).
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, "tests")

torch = pytest.importorskip("torch")

from reference_torch import load_reference  # noqa: E402

from funasr_tpu.convert import paraformer_from_torch  # noqa: E402
from funasr_tpu.models.paraformer.model import Paraformer  # noqa: E402

V, IN, D = 32, 24, 16
ENC = dict(output_size=D, attention_heads=2, linear_units=32, num_blocks=3,
           kernel_size=5, dropout_rate=0.0, attention_dropout_rate=0.0)
DEC = dict(attention_heads=2, linear_units=32, num_blocks=2,
           att_layer_num=2, kernel_size=5, dropout_rate=0.0,
           self_attention_dropout_rate=0.0, src_attention_dropout_rate=0.0)
PRED = dict(idim=D, threshold=1.0, l_order=1, r_order=1,
            tail_threshold=0.45)


@pytest.fixture(scope="module")
def ref_model():
    # importing the modules registers the classes in the reference registry
    load_reference("funasr.models.sanm.encoder")
    load_reference("funasr.models.paraformer.decoder")
    load_reference("funasr.models.paraformer.cif_predictor")
    pm = load_reference("funasr.models.paraformer.model")
    torch.manual_seed(0)  # CIF fire boundaries are float-sensitive; pin
    m = pm.Paraformer(
        encoder="SANMEncoder", encoder_conf=dict(ENC, input_layer="pe"),
        decoder="ParaformerSANMDecoder", decoder_conf=dict(DEC),
        predictor="CifPredictorV2", predictor_conf=dict(PRED),
        ctc_weight=0.0, input_size=IN, vocab_size=V,
        predictor_weight=1.0, predictor_bias=1, sampling_ratio=0.0,
    )
    m.eval()
    return m


@pytest.fixture(scope="module")
def jax_model_and_params(ref_model):
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    params = paraformer_from_torch(sd)
    model = Paraformer(vocab_size=V, input_size=IN, encoder_conf=ENC,
                       decoder_conf=DEC, predictor_conf=PRED,
                       sampling_ratio=0.0)
    return model, {"params": params} if "params" not in params else params


@pytest.fixture(scope="module")
def speech(rng_mod=None):
    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 30, IN)).astype(np.float32)
    lens = np.array([30, 22], np.int32)
    return x, lens


def test_encoder_parity(ref_model, jax_model_and_params, speech):
    x, lens = speech
    with torch.no_grad():
        ref_out, ref_lens = ref_model.encode(
            torch.from_numpy(x), torch.from_numpy(lens.astype(np.int64)))
    model, params = jax_model_and_params
    out, out_lens = model.apply(params, jnp.asarray(x), jnp.asarray(lens),
                                method=model.encode)
    assert out_lens.tolist() == ref_lens.tolist()
    for b, n in enumerate(lens):
        np.testing.assert_allclose(
            np.asarray(out)[b, :n], ref_out.numpy()[b, :n],
            rtol=2e-4, atol=2e-4)


def test_full_greedy_parity(ref_model, jax_model_and_params, speech):
    x, lens = speech
    with torch.no_grad():
        enc, enc_lens = ref_model.encode(
            torch.from_numpy(x), torch.from_numpy(lens.astype(np.int64)))
        pre_embeds, pre_token_len, _, _ = ref_model.calc_predictor(
            enc, enc_lens)
        pre_token_len = pre_token_len.round().long()
        dec_out, _ = ref_model.cal_decoder_with_predictor(
            enc, enc_lens, pre_embeds, pre_token_len)
    ref_logp = dec_out.numpy()  # reference returns log_softmax already

    model, params = jax_model_and_params
    U = ref_logp.shape[1]
    log_probs, tok_lens, _ = model.apply(
        params, jnp.asarray(x), jnp.asarray(lens), max_tokens=U,
        method=model.inference_logits)
    assert tok_lens.tolist() == pre_token_len.tolist()
    lp = np.asarray(log_probs)
    for b, n in enumerate(np.asarray(tok_lens)):
        np.testing.assert_allclose(lp[b, :n], ref_logp[b, :n],
                                   rtol=2e-3, atol=2e-3)
        # identical greedy tokens
        np.testing.assert_array_equal(lp[b, :n].argmax(-1),
                                      ref_logp[b, :n].argmax(-1))


def test_fsmn_vad_scorer_parity():
    """FSMN VAD scorer posteriors match the reference net bit-for-bit-ish."""
    from funasr_tpu.convert import fsmn_vad_from_torch
    from funasr_tpu.models.fsmn_vad.encoder import FSMN as JaxFSMN

    m = load_reference("funasr.models.fsmn_vad_streaming.encoder")
    net = m.FSMN(40, 32, 3, 48, 24, 5, 2, 1, 1, 32, 6)
    net.eval()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params = fsmn_vad_from_torch(sd)
    jnet = JaxFSMN(input_dim=40, input_affine_dim=32, fsmn_layers=3,
                   linear_dim=48, proj_dim=24, lorder=5, rorder=2,
                   lstride=1, rstride=1, output_affine_dim=32, output_dim=6)
    x = np.random.default_rng(3).standard_normal((2, 25, 40)).astype(
        np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x)).numpy()
    ours = np.asarray(jnet.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_ct_transformer_parity():
    """Punctuation logits match the reference CT-Transformer."""
    from funasr_tpu.convert import ct_transformer_from_torch
    from funasr_tpu.models.ct_transformer.model import CTTransformer

    m = load_reference("funasr.models.ct_transformer.model")
    torch.manual_seed(0)
    enc_conf = dict(input_size=16, output_size=16, attention_heads=2,
                    linear_units=32, num_blocks=2, kernel_size=5,
                    dropout_rate=0.0, attention_dropout_rate=0.0,
                    input_layer="pe")
    net = m.CTTransformer(vocab_size=50,
                          punc_list=["<unk>", "_", "，", "。", "？", "、"],
                          embed_unit=16, att_unit=16,
                          encoder="SANMEncoder", encoder_conf=enc_conf)
    net.eval()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params = ct_transformer_from_torch(sd)
    ours = CTTransformer(vocab_size=50, punc_size=6, embed_unit=16,
                         att_unit=16,
                         encoder_conf=dict(output_size=16, attention_heads=2,
                                           linear_units=32, num_blocks=2,
                                           kernel_size=5, dropout_rate=0.0))
    text = np.random.default_rng(5).integers(0, 50, (2, 12)).astype(np.int32)
    tlens = np.array([12, 8], np.int32)
    with torch.no_grad():
        ref_logits, _ = net.punc_forward(
            torch.from_numpy(text.astype(np.int64)),
            torch.from_numpy(tlens.astype(np.int64)))
    got = np.asarray(ours.apply(params, jnp.asarray(text),
                                jnp.asarray(tlens)))
    for b, n in enumerate(tlens):
        np.testing.assert_allclose(got[b, :n], ref_logits.numpy()[b, :n],
                                   rtol=1e-4, atol=1e-5)


def test_conformer_encoder_parity():
    """Conformer encoder outputs match the reference implementation."""
    from funasr_tpu.convert import conformer_from_torch
    from funasr_tpu.models.conformer import ConformerEncoder

    m = load_reference("funasr.models.conformer.encoder")
    torch.manual_seed(0)
    net = m.ConformerEncoder(
        input_size=20, output_size=16, attention_heads=2, linear_units=32,
        num_blocks=2, dropout_rate=0.0, positional_dropout_rate=0.0,
        attention_dropout_rate=0.0, input_layer="conv2d",
        cnn_module_kernel=7, macaron_style=True, use_cnn_module=True,
        rel_pos_type="latest")  # latest = Transformer-XL 2T-1 rel-pos (ours)
    net.eval()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    F_after = ((20 - 1) // 2 - 1) // 2
    variables = conformer_from_torch(sd, F_after)
    ours = ConformerEncoder(input_size=20, output_size=16,
                            attention_heads=2, linear_units=32, num_blocks=2,
                            cnn_module_kernel=7, dropout_rate=0.0,
                            attention_dropout_rate=0.0)
    x = np.random.default_rng(11).standard_normal((2, 40, 20)).astype(
        np.float32)
    lens = np.array([40, 30], np.int32)
    with torch.no_grad():
        ref_out, ref_lens, _ = net(torch.from_numpy(x),
                                   torch.from_numpy(lens.astype(np.int64)))
    got, got_lens = ours.apply(variables, jnp.asarray(x), jnp.asarray(lens))
    # reference masks outputs; compare valid region
    for b in range(2):
        n = int(got_lens[b])
        np.testing.assert_allclose(np.asarray(got)[b, :n],
                                   ref_out.numpy()[b, :n],
                                   rtol=5e-4, atol=5e-4)


def test_sense_voice_parity():
    """SenseVoice CTC logits (incl. the 4 prompt-query positions) match the
    reference SenseVoiceEncoderSmall + prompt composition + ctc_lo."""
    from funasr_tpu.convert import sense_voice_from_torch
    from funasr_tpu.models.sense_voice.model import SenseVoiceSmall

    m = load_reference("funasr.models.sense_voice.model")
    torch.manual_seed(3)
    IN_SV, D_SV, V_SV = 20, 16, 40
    enc = m.SenseVoiceEncoderSmall(
        input_size=IN_SV, output_size=D_SV, attention_heads=2,
        linear_units=32, num_blocks=2, tp_blocks=2, kernel_size=5,
        dropout_rate=0.0, attention_dropout_rate=0.0)
    enc.eval()
    embed = torch.nn.Embedding(16, IN_SV)
    ctc_lo = torch.nn.Linear(D_SV, V_SV)
    sd = {}
    for k, v in enc.state_dict().items():
        sd[f"encoder.{k}"] = v.detach().numpy()
    sd["embed.weight"] = embed.weight.detach().numpy()
    sd["ctc.ctc_lo.weight"] = ctc_lo.weight.detach().numpy()
    sd["ctc.ctc_lo.bias"] = ctc_lo.bias.detach().numpy()
    params = sense_voice_from_torch(sd)

    ours = SenseVoiceSmall(
        vocab_size=V_SV, input_size=IN_SV,
        encoder_conf=dict(output_size=D_SV, attention_heads=2,
                          linear_units=32, num_blocks=2, tp_blocks=2,
                          kernel_size=5, dropout_rate=0.0))

    rng = np.random.default_rng(9)
    x = rng.standard_normal((2, 26, IN_SV)).astype(np.float32)
    lens = np.array([26, 18], np.int32)
    lid = np.array([3, 4], np.int32)       # zh, en query ids
    tn = np.array([15, 14], np.int32)      # woitn, withitn

    # reference composition (model.py:756-772): [lang, event, emo, style]
    with torch.no_grad():
        sp = torch.from_numpy(x)
        lang_q = embed(torch.from_numpy(lid.astype(np.int64))[:, None])
        style_q = embed(torch.from_numpy(tn.astype(np.int64))[:, None])
        ev_emo = embed(torch.tensor([[1, 2]])).repeat(2, 1, 1)
        sp = torch.cat([lang_q, ev_emo, style_q, sp], dim=1)
        sl = torch.from_numpy((lens + 4).astype(np.int64))
        ref_out, _ = enc(sp, sl)
        ref_logits = ctc_lo(ref_out).numpy()

    got = np.asarray(ours.apply(
        params, jnp.asarray(x), jnp.asarray(lens), jnp.asarray(lid),
        jnp.asarray(tn), True,
        method=lambda mdl, s, sl_, li, tn_, det: mdl.ctc_lo(
            mdl.encode(s, sl_, li, tn_, det)[0])))
    for b, n in enumerate(lens + 4):
        np.testing.assert_allclose(got[b, :n], ref_logits[b, :n],
                                   rtol=1e-4, atol=1e-4)


def test_campplus_parity():
    """Speaker embeddings match the reference CAM++ D-TDNN."""
    from funasr_tpu.convert import campplus_from_torch
    from funasr_tpu.models.campplus.model import CAMPPlus

    m = load_reference("funasr.models.campplus.model")
    torch.manual_seed(1)
    net = m.CAMPPlus(feat_dim=16, embedding_size=8, growth_rate=4,
                     bn_size=2, init_channels=8, memory_efficient=False)
    net.eval()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    variables = campplus_from_torch(sd)

    ours = CAMPPlus(feat_dim=16, embedding_size=8, growth_rate=4,
                    bn_size=2, init_channels=8)
    rng = np.random.default_rng(13)
    # > 100 frames after the stride-2 tdnn so CAM segment pooling hits the
    # ceil-mode tail-average path
    x = rng.standard_normal((2, 230, 16)).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x)).numpy()
    got = np.asarray(ours.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("kind", ["light", "light2d", "dynamic", "dynamic2d"])
def test_conv_attention_parity(kind):
    """Lightweight/dynamic convolution 'attention' matches the reference
    fairseq-style modules (transformer/utils/{lightconv,dynamic_conv}*.py)."""
    from funasr_tpu.models.transformer.decoder import (DynamicConvolution,
                                                       LightweightConvolution)

    H, C, k, B, T = 2, 8, 5, 2, 12
    torch.manual_seed(0)
    if kind == "light":
        m = load_reference("funasr.models.transformer.utils.lightconv")
        ref = m.LightweightConvolution(H, C, 0.0, k, use_kernel_mask=True,
                                       use_bias=True)
    elif kind == "light2d":
        m = load_reference("funasr.models.transformer.utils.lightconv2d")
        ref = m.LightweightConvolution2D(H, C, 0.0, k, use_kernel_mask=True,
                                         use_bias=True)
    elif kind == "dynamic":
        m = load_reference("funasr.models.transformer.utils.dynamic_conv")
        ref = m.DynamicConvolution(H, C, 0.0, k, use_kernel_mask=True,
                                   use_bias=True)
    else:
        m = load_reference("funasr.models.transformer.utils.dynamic_conv2d")
        ref = m.DynamicConvolution2D(H, C, 0.0, k, use_kernel_mask=True,
                                     use_bias=True)
    ref.eval()
    sd = {kk: v.detach().numpy() for kk, v in ref.state_dict().items()}

    params = {
        "linear1": {"kernel": sd["linear1.weight"].T,
                    "bias": sd["linear1.bias"]},
        "linear2": {"kernel": sd["linear2.weight"].T,
                    "bias": sd["linear2.bias"]},
        "bias": sd["bias"],
    }
    if kind.startswith("light"):
        params["weight"] = sd["weight"][:, 0, :]
        if kind.endswith("2d"):
            params["weight_f"] = sd["weight_f"][0, 0]
        ours = LightweightConvolution(wshare=H, n_feat=C, kernel_size=k,
                                      use_kernel_mask=True, use_bias=True,
                                      freq2d=kind.endswith("2d"))
    else:
        params["linear_weight"] = {"kernel": sd["linear_weight.weight"].T,
                                   "bias": sd["linear_weight.bias"]}
        if kind.endswith("2d"):
            params["linear_weight_f"] = {
                "kernel": sd["linear_weight_f.weight"].T,
                "bias": sd["linear_weight_f.bias"]}
        ours = DynamicConvolution(wshare=H, n_feat=C, kernel_size=k,
                                  use_kernel_mask=True, use_bias=True,
                                  freq2d=kind.endswith("2d"))

    x = np.random.default_rng(3).standard_normal((B, T, C)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x), None, None, None).numpy()
    got = np.asarray(ours.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_lightconv_decoder_in_hybrid(rng=np.random.default_rng(4)):
    """Conformer + LightweightConvolutionTransformerDecoder end to end."""
    from funasr_tpu.models.transformer.model import Conformer

    m = Conformer(
        vocab_size=12, input_size=20,
        encoder_conf=dict(output_size=16, attention_heads=2,
                          linear_units=32, num_blocks=2,
                          cnn_module_kernel=7, dropout_rate=0.0),
        decoder="LightweightConvolutionTransformerDecoder",
        decoder_conf=dict(attention_heads=2, linear_units=32, num_blocks=2,
                          dropout_rate=0.0, conv_wshare=2,
                          conv_kernel_length=(3, 5)))
    x = jnp.asarray(rng.standard_normal((2, 24, 20)), jnp.float32)
    lens = jnp.array([24, 16], jnp.int32)
    text = jnp.array([[3, 4, 5], [6, 7, 0]], jnp.int32)
    tlens = jnp.array([3, 2], jnp.int32)
    params = m.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, lens, text, tlens)
    loss, _ = m.apply(params, x, lens, text, tlens, deterministic=True)
    assert np.isfinite(float(loss))
    toks, lens_out, scores = m.apply(params, x, lens, 3, 5,
                                     method=m.decode_beam)
    assert toks.shape[0] == 2 and np.isfinite(np.asarray(scores)).all()


# --------------------------------------------------------------------------
# BiCifParaformer: upsampled timestamp track parity
# --------------------------------------------------------------------------

PRED_V3 = dict(idim=D, threshold=1.0, l_order=1, r_order=1,
               tail_threshold=0.45, smooth_factor2=0.25,
               noise_threshold2=0.01, upsample_times=3, use_cif1_cnn=False)


@pytest.fixture(scope="module")
def bicif_pair():
    from funasr_tpu.convert import bicif_paraformer_from_torch
    from funasr_tpu.models.bicif_paraformer.model import BiCifParaformer

    load_reference("funasr.models.sanm.encoder")
    load_reference("funasr.models.paraformer.decoder")
    load_reference("funasr.models.bicif_paraformer.cif_predictor")
    bm = load_reference("funasr.models.bicif_paraformer.model")
    torch.manual_seed(1)
    ref = bm.BiCifParaformer(
        encoder="SANMEncoder", encoder_conf=dict(ENC, input_layer="pe"),
        decoder="ParaformerSANMDecoder", decoder_conf=dict(DEC),
        predictor="CifPredictorV3",
        predictor_conf=dict(PRED_V3, upsample_type="cnn"),
        ctc_weight=0.0, input_size=IN, vocab_size=V,
        predictor_weight=1.0, predictor_bias=1, sampling_ratio=0.0,
    )
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = bicif_paraformer_from_torch(sd)
    ours = BiCifParaformer(vocab_size=V, input_size=IN, encoder_conf=ENC,
                           decoder_conf=DEC, predictor_conf=PRED_V3,
                           sampling_ratio=0.0)
    return ref, ours, params


def test_bicif_timestamp_parity(bicif_pair, speech):
    ref, ours, params = bicif_pair
    x, lens = speech
    with torch.no_grad():
        enc, enc_lens = ref.encode(
            torch.from_numpy(x), torch.from_numpy(lens.astype(np.int64)))
        _, tok_len, _, _ = ref.calc_predictor(enc, enc_lens)
        tok_len = tok_len.round().long()
        _, _, us_alphas, us_fires = ref.calc_predictor_timestamp(
            enc, enc_lens, tok_len)
    U = int(tok_len.max()) + 2
    _, tok_lens, pred = ours.apply(
        params, jnp.asarray(x), jnp.asarray(lens), max_tokens=U,
        method=ours.inference_logits)
    assert tok_lens.tolist() == tok_len.tolist()
    theta = 1.0 - 1e-4
    ref_peaks = us_fires.numpy() >= theta
    got_alphas = np.asarray(pred.us_alphas)
    got_peaks = np.asarray(pred.us_peaks)
    for b, n in enumerate(lens):
        nu = int(n) * 3
        np.testing.assert_allclose(got_alphas[b, :nu],
                                   us_alphas.numpy()[b, :nu],
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(got_peaks[b, :nu], ref_peaks[b, :nu])


# --------------------------------------------------------------------------
# SeacoParaformer: merged hotword log-prob parity
# --------------------------------------------------------------------------


def test_seaco_hotword_parity(speech):
    from funasr_tpu.convert import seaco_paraformer_from_torch
    from funasr_tpu.models.seaco_paraformer.model import SeacoParaformer

    load_reference("funasr.models.sanm.encoder")
    load_reference("funasr.models.paraformer.decoder")
    load_reference("funasr.models.bicif_paraformer.cif_predictor")
    sm = load_reference("funasr.models.seaco_paraformer.model")
    torch.manual_seed(2)
    sdec = dict(attention_heads=2, linear_units=32, num_blocks=2,
                att_layer_num=2, kernel_size=5, dropout_rate=0.0,
                self_attention_dropout_rate=0.0,
                src_attention_dropout_rate=0.0, use_output_layer=False)
    ref = sm.SeacoParaformer(
        encoder="SANMEncoder", encoder_conf=dict(ENC, input_layer="pe"),
        decoder="ParaformerSANMDecoder", decoder_conf=dict(DEC),
        predictor="CifPredictorV3",
        predictor_conf=dict(PRED_V3, upsample_type="cnn"),
        seaco_decoder="ParaformerSANMDecoder", seaco_decoder_conf=sdec,
        inner_dim=D, NO_BIAS=V - 1, seaco_weight=1.0,
        ctc_weight=0.0, input_size=IN, vocab_size=V,
        predictor_weight=1.0, predictor_bias=1, sampling_ratio=0.0,
    )
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = seaco_paraformer_from_torch(sd)

    ours = SeacoParaformer(
        vocab_size=V, input_size=IN, encoder_conf=ENC, decoder_conf=DEC,
        predictor_conf=PRED_V3,
        seaco_decoder_conf={k: v for k, v in sdec.items()
                            if k != "use_output_layer"},
        inner_dim=D, no_bias_id=V - 1, seaco_weight=1.0, sampling_ratio=0.0)

    x, lens = speech
    hw_list = [[3, 4], [7], [V - 1]]  # last row = no-bias entry
    with torch.no_grad():
        enc, enc_lens = ref.encode(
            torch.from_numpy(x), torch.from_numpy(lens.astype(np.int64)))
        pre_embeds, tok_len, _, _ = ref.calc_predictor(enc, enc_lens)
        tok_len = tok_len.round().long()
        want = ref._seaco_decode_with_ASF(
            enc, enc_lens, pre_embeds, tok_len, hw_list,
            nfilter=0, seaco_weight=1.0).numpy()

    U = want.shape[1]
    hw_pad = np.zeros((3, 2), np.int32)
    hw_lens = np.array([2, 1, 1], np.int32)
    for i, hw in enumerate(hw_list):
        hw_pad[i, :len(hw)] = hw
    got, tok_lens, _ = ours.apply(
        params, jnp.asarray(x), jnp.asarray(lens), jnp.asarray(hw_pad),
        jnp.asarray(hw_lens), max_tokens=U, method=ours.hotword_logprobs)
    assert tok_lens.tolist() == tok_len.tolist()
    got = np.asarray(got)
    for b, n in enumerate(np.asarray(tok_lens)):
        np.testing.assert_allclose(got[b, :n], want[b, :n],
                                   rtol=2e-3, atol=2e-3)
        np.testing.assert_array_equal(got[b, :n].argmax(-1),
                                      want[b, :n].argmax(-1))


def test_contextual_hotword_parity(speech):
    """ContextualParaformer decoder with the in-decoder bias branch matches
    the reference cal_decoder_with_predictor (contextual_paraformer/
    model.py:298) logit for logit."""
    from funasr_tpu.convert import contextual_paraformer_from_torch
    from funasr_tpu.models.contextual_paraformer.model import (
        ContextualParaformer,
    )

    load_reference("funasr.models.sanm.encoder")
    load_reference("funasr.models.paraformer.decoder")
    load_reference("funasr.models.paraformer.cif_predictor")
    cm = load_reference("funasr.models.contextual_paraformer.model")
    torch.manual_seed(5)
    ref = cm.ContextualParaformer(
        encoder="SANMEncoder", encoder_conf=dict(ENC, input_layer="pe"),
        decoder="ContextualParaformerDecoder", decoder_conf=dict(DEC),
        predictor="CifPredictorV2", predictor_conf=dict(PRED),
        inner_dim=D, ctc_weight=0.0, input_size=IN, vocab_size=V,
        predictor_weight=1.0, predictor_bias=1, sampling_ratio=0.0,
    )
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {"params": contextual_paraformer_from_torch(sd)["params"]}

    ours = ContextualParaformer(
        vocab_size=V, input_size=IN, encoder_conf=ENC, decoder_conf=DEC,
        predictor_conf=PRED, inner_dim=D, sampling_ratio=0.0)

    x, lens = speech
    hw_list = [[3, 4], [7], [1]]
    with torch.no_grad():
        enc, enc_lens = ref.encode(
            torch.from_numpy(x), torch.from_numpy(lens.astype(np.int64)))
        pre_embeds, tok_len, _, _ = ref.calc_predictor(enc, enc_lens)
        tok_len = tok_len.round().long()
        want, _ = ref.cal_decoder_with_predictor(
            enc, enc_lens, pre_embeds, tok_len,
            hw_list=[torch.tensor(h) for h in hw_list])
        want = want.numpy()

    U = want.shape[1]
    hw_pad = np.zeros((3, 2), np.int32)
    hw_lens = np.array([2, 1, 1], np.int32)
    for i, hw in enumerate(hw_list):
        hw_pad[i, :len(hw)] = hw
    toks, tok_lens_j = ours.apply(
        params, jnp.asarray(x), jnp.asarray(lens), jnp.asarray(hw_pad),
        jnp.asarray(hw_lens), max_tokens=U,
        method=ours.decode_with_hotwords)
    assert tok_lens_j.tolist() == tok_len.tolist()
    # logits parity needs the raw decoder output: run the decoder directly
    from funasr_tpu.models.paraformer.model import Paraformer  # noqa: F401

    def run_logits(mdl, x_, lens_, hw_pad_, hw_lens_):
        enc_j, enc_lens_j = mdl.encode(x_, lens_, True)
        pred = mdl.predictor(enc_j, enc_lens_j, max_tokens=U,
                             deterministic=True)
        tl = jnp.clip(jnp.round(pred.token_num).astype(jnp.int32), 0, U)
        mem = mdl._hotword_memory(hw_pad_, hw_lens_)
        ctx = jnp.broadcast_to(mem[None], (enc_j.shape[0],) + mem.shape)
        logits = mdl.decoder(enc_j, enc_lens_j, pred.acoustic_embeds, tl,
                             True, contextual_info=ctx)
        return jax.nn.log_softmax(logits.astype(jnp.float32), -1), tl

    got, tl = ours.apply(params, jnp.asarray(x), jnp.asarray(lens),
                         jnp.asarray(hw_pad), jnp.asarray(hw_lens),
                         method=run_logits)
    got = np.asarray(got)
    for b, n in enumerate(np.asarray(tl)):
        np.testing.assert_allclose(got[b, :n], want[b, :n],
                                   rtol=2e-3, atol=2e-3)
        np.testing.assert_array_equal(got[b, :n].argmax(-1),
                                      want[b, :n].argmax(-1))


# --------------------------------------------------------------------------
# Flagship-width parity: 512-d/560-in Paraformer-large dims (layout bugs the
# D=16 toy cannot catch: head splits, fused-qkv slicing, LFR-input embed)
# --------------------------------------------------------------------------


def test_flagship_width_parity():
    """Paraformer at production width (560-in LFR, 512-d, 2048 FFN, 4 heads,
    kernel 11 — the Paraformer-large template.yaml dims, depth reduced) —
    converted-weights greedy decode matches the reference token for token."""
    from funasr_tpu.convert import paraformer_from_torch
    from funasr_tpu.models.paraformer.model import Paraformer as JaxPara

    load_reference("funasr.models.sanm.encoder")
    load_reference("funasr.models.paraformer.decoder")
    load_reference("funasr.models.paraformer.cif_predictor")
    pm = load_reference("funasr.models.paraformer.model")
    VF, INF, DF = 120, 560, 512
    ENC_F = dict(output_size=DF, attention_heads=4, linear_units=2048,
                 num_blocks=4, kernel_size=11, dropout_rate=0.0,
                 attention_dropout_rate=0.0)
    DEC_F = dict(attention_heads=4, linear_units=2048, num_blocks=3,
                 att_layer_num=2, kernel_size=11, dropout_rate=0.0,
                 self_attention_dropout_rate=0.0,
                 src_attention_dropout_rate=0.0)
    PRED_F = dict(idim=DF, threshold=1.0, l_order=1, r_order=1,
                  tail_threshold=0.45)
    torch.manual_seed(14)
    ref = pm.Paraformer(
        encoder="SANMEncoder", encoder_conf=dict(ENC_F, input_layer="pe"),
        decoder="ParaformerSANMDecoder", decoder_conf=dict(DEC_F),
        predictor="CifPredictorV2", predictor_conf=dict(PRED_F),
        ctc_weight=0.0, input_size=INF, vocab_size=VF,
        predictor_weight=1.0, predictor_bias=1, sampling_ratio=0.0,
    )
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = paraformer_from_torch(sd)
    ours = JaxPara(vocab_size=VF, input_size=INF, encoder_conf=ENC_F,
                   decoder_conf=DEC_F, predictor_conf=PRED_F,
                   sampling_ratio=0.0)

    rng = np.random.default_rng(15)
    x = rng.standard_normal((2, 48, INF)).astype(np.float32) * 0.5
    lens = np.array([48, 36], np.int32)
    with torch.no_grad():
        enc, enc_lens = ref.encode(
            torch.from_numpy(x), torch.from_numpy(lens.astype(np.int64)))
        pre_embeds, tok_len, _, _ = ref.calc_predictor(enc, enc_lens)
        tok_len = tok_len.round().long()
        dec_out, _ = ref.cal_decoder_with_predictor(
            enc, enc_lens, pre_embeds, tok_len)
    ref_logp = dec_out.numpy()

    U = ref_logp.shape[1]
    log_probs, tok_lens, _ = ours.apply(
        params, jnp.asarray(x), jnp.asarray(lens), max_tokens=U,
        method=ours.inference_logits)
    assert tok_lens.tolist() == tok_len.tolist()
    lp = np.asarray(log_probs)
    for b, n in enumerate(np.asarray(tok_lens)):
        np.testing.assert_allclose(lp[b, :n], ref_logp[b, :n],
                                   rtol=5e-3, atol=5e-3)
        np.testing.assert_array_equal(lp[b, :n].argmax(-1),
                                      ref_logp[b, :n].argmax(-1))


def test_bicif_timestamp_parity_cnn_blstm(speech):
    """The PUBLISHED BiCif/SeACo configs use upsample_type cnn_blstm
    (bicif template.yaml:61) — the upsampled alpha track must match the
    reference through the converted bidirectional-LSTM head too."""
    from funasr_tpu.convert import bicif_paraformer_from_torch
    from funasr_tpu.models.bicif_paraformer.model import BiCifParaformer

    load_reference("funasr.models.sanm.encoder")
    load_reference("funasr.models.paraformer.decoder")
    load_reference("funasr.models.bicif_paraformer.cif_predictor")
    bm = load_reference("funasr.models.bicif_paraformer.model")
    torch.manual_seed(5)
    ref = bm.BiCifParaformer(
        encoder="SANMEncoder", encoder_conf=dict(ENC, input_layer="pe"),
        decoder="ParaformerSANMDecoder", decoder_conf=dict(DEC),
        predictor="CifPredictorV3",
        predictor_conf=dict(PRED_V3, upsample_type="cnn_blstm"),
        ctc_weight=0.0, input_size=IN, vocab_size=V,
        predictor_weight=1.0, predictor_bias=1, sampling_ratio=0.0,
    )
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = bicif_paraformer_from_torch(sd)
    ours = BiCifParaformer(
        vocab_size=V, input_size=IN, encoder_conf=ENC, decoder_conf=DEC,
        predictor_conf=dict(PRED_V3, upsample_type="cnn_blstm"),
        sampling_ratio=0.0)

    x, lens = speech
    with torch.no_grad():
        enc, enc_lens = ref.encode(
            torch.from_numpy(x), torch.from_numpy(lens.astype(np.int64)))
        _, tok_len, _, _ = ref.calc_predictor(enc, enc_lens)
        tok_len = tok_len.round().long()
        _, _, us_alphas, _ = ref.calc_predictor_timestamp(
            enc, enc_lens, tok_len)
    U = int(tok_len.max()) + 2
    _, tok_lens, pred = ours.apply(
        params, jnp.asarray(x), jnp.asarray(lens), max_tokens=U,
        method=ours.inference_logits)
    assert tok_lens.tolist() == tok_len.tolist()
    got = np.asarray(pred.us_alphas)
    for b, n in enumerate(lens):
        nu = n * 3
        np.testing.assert_allclose(got[b, :nu], us_alphas.numpy()[b, :nu],
                                   rtol=2e-4, atol=2e-4)

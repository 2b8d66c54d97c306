"""Checkpoint-converter parity for the secondary model families vs the
ACTUAL reference torch code (/root/reference): MonotonicAligner, Transducer,
FSMN-KWS, SCAMA, UniASR.

Each test builds a tiny reference torch model, converts its state_dict
through funasr_tpu.convert, and checks our JAX outputs agree logit-for-
logit — so published checkpoints of these families load correctly.
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, "tests")

torch = pytest.importorskip("torch")

from reference_torch import load_reference  # noqa: E402

V, IN, D = 32, 24, 16
ENC = dict(output_size=D, attention_heads=2, linear_units=32, num_blocks=3,
           kernel_size=5, dropout_rate=0.0, attention_dropout_rate=0.0)
DEC = dict(attention_heads=2, linear_units=32, num_blocks=2,
           att_layer_num=2, kernel_size=5, dropout_rate=0.0,
           self_attention_dropout_rate=0.0, src_attention_dropout_rate=0.0)
PRED = dict(idim=D, threshold=1.0, l_order=1, r_order=1,
            tail_threshold=0.45)
PRED_V3 = dict(idim=D, threshold=1.0, l_order=1, r_order=1,
               tail_threshold=0.45, smooth_factor2=0.25,
               noise_threshold2=0.01, upsample_times=3, use_cif1_cnn=False)


def _speech(seed=7, B=2, T=30):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((B, T, IN)).astype(np.float32)
    lens = np.array([T, T - 8], np.int32)[:B]
    return x, lens


# --------------------------------------------------------------------------
# MonotonicAligner ("fa-zh")
# --------------------------------------------------------------------------


def test_monotonic_aligner_parity():
    """Upsampled CIF alphas/fires match the reference forced aligner
    (monotonic_aligner/model.py:118 calc_predictor_timestamp)."""
    from funasr_tpu.convert import monotonic_aligner_from_torch
    from funasr_tpu.models.monotonic_aligner.model import MonotonicAligner

    load_reference("funasr.models.sanm.encoder")
    load_reference("funasr.models.bicif_paraformer.cif_predictor")
    mm = load_reference("funasr.models.monotonic_aligner.model")
    torch.manual_seed(4)
    ref = mm.MonotonicAligner(
        input_size=IN, encoder="SANMEncoder",
        encoder_conf=dict(ENC, input_layer="pe"),
        predictor="CifPredictorV3",
        predictor_conf=dict(PRED_V3, upsample_type="cnn"),
    )
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = monotonic_aligner_from_torch(sd)

    ours = MonotonicAligner(input_size=IN, encoder_conf=ENC,
                            predictor_conf=PRED_V3)
    from funasr_tpu.convert import check_tree_matches
    init = ours.init(jax.random.PRNGKey(0), *map(jnp.asarray, _speech()),
                     jnp.zeros((2, 4), jnp.int32),
                     jnp.array([4, 3], jnp.int32), True)
    assert check_tree_matches(params, init) == []

    x, lens = _speech()
    tok_num = np.array([5, 4], np.int64)
    with torch.no_grad():
        enc, enc_lens = ref.encode(
            torch.from_numpy(x), torch.from_numpy(lens.astype(np.int64)))
        _, _, us_alphas, us_fires = ref.calc_predictor_timestamp(
            enc, enc_lens, torch.from_numpy(tok_num))

    got_alphas, got_peaks = ours.apply(
        params, jnp.asarray(x), jnp.asarray(lens),
        jnp.asarray(tok_num, jnp.int32), method=ours.align)
    got_alphas = np.asarray(got_alphas)
    got_peaks = np.asarray(got_peaks)
    theta = 1.0 - 1e-4
    ref_peaks = us_fires.numpy() >= theta
    for b, n in enumerate(lens):
        nu = int(n) * 3
        np.testing.assert_allclose(got_alphas[b, :nu],
                                   us_alphas.numpy()[b, :nu],
                                   rtol=2e-3, atol=2e-4)
        np.testing.assert_array_equal(got_peaks[b, :nu] > 0,
                                      ref_peaks[b, :nu])


# --------------------------------------------------------------------------
# Transducer (RNN-T)
# --------------------------------------------------------------------------


def test_transducer_parity():
    """Joint logits over the full (T, U+1) grid match the reference
    Conformer encoder + RNNT prediction net + JointNetwork."""
    from funasr_tpu.convert import transducer_from_torch
    from funasr_tpu.models.transducer.model import Transducer

    enc_m = load_reference("funasr.models.conformer.encoder")
    dec_m = load_reference("funasr.models.transducer.rnnt_decoder")
    joint_m = load_reference("funasr.models.transducer.joint_network")
    torch.manual_seed(6)
    IN_T = 20
    enc = enc_m.ConformerEncoder(
        input_size=IN_T, output_size=D, attention_heads=2, linear_units=32,
        num_blocks=2, dropout_rate=0.0, positional_dropout_rate=0.0,
        attention_dropout_rate=0.0, input_layer="conv2d",
        cnn_module_kernel=7, macaron_style=True, use_cnn_module=True,
        rel_pos_type="latest")
    dec = dec_m.RNNTDecoder(V, embed_size=12, hidden_size=12, num_layers=2)
    joint = joint_m.JointNetwork(V, D, 12, joint_space_size=20)
    for m in (enc, dec, joint):
        m.eval()

    sd = {}
    for prefix, mod in (("encoder", enc), ("decoder", dec),
                        ("joint_network", joint)):
        for k, v in mod.state_dict().items():
            sd[f"{prefix}.{k}"] = v.detach().numpy()
    F_after = ((IN_T - 1) // 2 - 1) // 2
    params = transducer_from_torch(sd, F_after)

    ours = Transducer(
        vocab_size=V, input_size=IN_T,
        encoder_conf=dict(output_size=D, attention_heads=2, linear_units=32,
                          num_blocks=2, cnn_module_kernel=7,
                          dropout_rate=0.0, attention_dropout_rate=0.0),
        decoder_conf=dict(embed_size=12, hidden_size=12, num_layers=2),
        joint_conf=dict(joint_size=20),
    )

    rng = np.random.default_rng(13)
    x = rng.standard_normal((2, 40, IN_T)).astype(np.float32)
    lens = np.array([40, 30], np.int32)
    tokens = rng.integers(1, V, (2, 5)).astype(np.int64)

    with torch.no_grad():
        enc_out, enc_lens, _ = enc(torch.from_numpy(x),
                                   torch.from_numpy(lens.astype(np.int64)))
        labels = torch.cat(
            [torch.zeros(2, 1, dtype=torch.long),
             torch.from_numpy(tokens)], dim=1)
        dec_out = dec(labels, None)
        want = joint(enc_out[:, :, None, :], dec_out[:, None, :, :]).numpy()

    got, got_lens = ours.apply(params, jnp.asarray(x), jnp.asarray(lens),
                               jnp.asarray(tokens, jnp.int32),
                               method=ours.logits_grid)
    got = np.asarray(got)
    assert got_lens.tolist() == enc_lens.tolist()
    for b, n in enumerate(np.asarray(got_lens)):
        np.testing.assert_allclose(got[b, :n], want[b, :n],
                                   rtol=5e-4, atol=5e-4)
        np.testing.assert_array_equal(got[b, :n].argmax(-1),
                                      want[b, :n].argmax(-1))


# --------------------------------------------------------------------------
# FSMN keyword spotting
# --------------------------------------------------------------------------


def test_fsmn_kws_parity():
    """CTC log-posteriors match reference FSMN AM + ctc_lo head; the
    out_linear2->ctc_lo affine fold in the converter is exact."""
    from funasr_tpu.convert import fsmn_kws_from_torch
    from funasr_tpu.models.kws.model import FsmnKWS

    m = load_reference("funasr.models.fsmn_kws.encoder")
    torch.manual_seed(8)
    # FSMNConvert (fsmn_kws/encoder.py:423) is the registered KWS encoder;
    # same in/out affines + FsmnStack layout as the VAD scorer
    net = m.FSMNConvert(20, 32, 3, 48, 24, 5, 2, 1, 1, 32, 10,
                        use_softmax=False)  # output_dim=10
    ctc_lo = torch.nn.Linear(10, V)
    net.eval()

    sd = {}
    for k, v in net.state_dict().items():
        sd[f"encoder.{k}"] = v.detach().numpy()
    sd["ctc.ctc_lo.weight"] = ctc_lo.weight.detach().numpy()
    sd["ctc.ctc_lo.bias"] = ctc_lo.bias.detach().numpy()
    params = fsmn_kws_from_torch(sd)

    kws = FsmnKWS(vocab_size=V, encoder_conf=dict(
        input_dim=20, input_affine_dim=32, fsmn_layers=3, linear_dim=48,
        proj_dim=24, lorder=5, rorder=2, lstride=1, rstride=1,
        output_affine_dim=32))
    kws.params = params

    x = np.random.default_rng(9).standard_normal((2, 25, 20)).astype(
        np.float32)
    with torch.no_grad():
        ref_logits = ctc_lo(net(torch.from_numpy(x))).numpy()
    got = np.asarray(kws._logits(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref_logits, rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(got.argmax(-1), ref_logits.argmax(-1))


# --------------------------------------------------------------------------
# SCAMA + UniASR (SANM-chunk encoders, CifPredictorV2, FsmnDecoderSCAMAOpt)
# --------------------------------------------------------------------------


def _mk_scama_decoder(mod, seed):
    torch.manual_seed(seed)
    dec = mod.FsmnDecoderSCAMAOpt(
        vocab_size=V, encoder_output_size=D, attention_heads=2,
        linear_units=32, num_blocks=3, att_layer_num=2, kernel_size=5,
        dropout_rate=0.0, positional_dropout_rate=0.0,
        self_attention_dropout_rate=0.0, src_attention_dropout_rate=0.0,
        input_layer="embed", sanm_shfit=0)
    dec.eval()
    return dec


def test_scama_parity():
    """SCAMA weight mapping: encoder outputs + decoder logits (fed the same
    token embeddings) match the reference modules."""
    from funasr_tpu.convert import scama_from_torch, check_tree_matches
    from funasr_tpu.models.scama.model import SCAMA

    load_reference("funasr.models.sanm.encoder")
    load_reference("funasr.models.paraformer.cif_predictor")
    enc_m = load_reference("funasr.models.scama.encoder")
    dec_m = load_reference("funasr.models.scama.decoder")
    cifs = load_reference("funasr.models.paraformer.cif_predictor")
    torch.manual_seed(10)
    # SANMEncoderChunkOpt shares the SANM layer/stack layout
    enc = enc_m.SANMEncoderChunkOpt(
        input_size=IN, output_size=D, attention_heads=2, linear_units=32,
        num_blocks=3, dropout_rate=0.0, positional_dropout_rate=0.0,
        attention_dropout_rate=0.0, input_layer="pe", kernel_size=5,
        chunk_size=(12,), stride=(8,), pad_left=(0,),
        encoder_att_look_back_factor=(1,), decoder_att_look_back_factor=(1,))
    enc.eval()
    dec = _mk_scama_decoder(dec_m, 11)
    pred = cifs.CifPredictorV2(**PRED)
    pred.eval()

    sd = {}
    for prefix, mod in (("encoder", enc), ("decoder", dec),
                        ("predictor", pred)):
        for k, v in mod.state_dict().items():
            sd[f"{prefix}.{k}"] = v.detach().numpy()
    params = scama_from_torch(sd)

    # r4: SCAMA's decoder is the real AR FsmnDecoderSCAMAOpt — it takes
    # token ids directly (models/scama/decoder.py); sanm_shfit=0 matches
    # the reference module built above
    ours = SCAMA(vocab_size=V, input_size=IN, encoder_conf=ENC,
                 decoder_conf=dict(DEC, num_blocks=3, sanm_shfit=0),
                 predictor_conf=PRED, sampling_ratio=0.0)
    x, lens = _speech(12)

    def run(mdl, x_, lens_, toks, tok_lens_):
        enc_j, enc_lens_j = mdl.encoder(x_, lens_, True)
        logits = mdl.decoder(enc_j, enc_lens_j, toks, tok_lens_,
                             deterministic=True)
        # touch the predictor so its params exist in the init tree
        _ = mdl.predictor(enc_j, enc_lens_j, max_tokens=4,
                          deterministic=True)
        return enc_j, logits

    init = ours.init({"params": jax.random.PRNGKey(0)},
                     jnp.asarray(x), jnp.asarray(lens),
                     jnp.zeros((2, 5), jnp.int32),
                     jnp.array([5, 4], jnp.int32), method=run)
    assert check_tree_matches(params, init) == []

    # encoder parity: run the reference SANM layer stack directly with full
    # masks (the overlap-chunk machinery is serving-time streaming state)
    xt = torch.from_numpy(x)
    lt = torch.from_numpy(lens.astype(np.int64))
    myutils = load_reference("funasr.models.scama.utils")
    with torch.no_grad():
        masks = myutils.sequence_mask(lt, maxlen=x.shape[1],
                                      device=xt.device)[:, None, :]
        h = xt * (D ** 0.5)
        h = enc.embed(h)
        h, _ = enc.encoders0(h, masks)[:2]
        h, _ = enc.encoders(h, masks)[:2]
        ref_enc = enc.after_norm(h)

        tokens = torch.randint(1, V, (2, 5))
        tok_lens = torch.tensor([5, 4])
        ref_logits, _ = dec(ref_enc, lt, tokens, tok_lens)
        ref_logits = ref_logits.numpy()

    enc_j, got = ours.apply(params, jnp.asarray(x), jnp.asarray(lens),
                            jnp.asarray(np.asarray(tokens), jnp.int32),
                            jnp.asarray(np.asarray(tok_lens), jnp.int32),
                            method=run)
    for b, n in enumerate(lens):
        np.testing.assert_allclose(np.asarray(enc_j)[b, :n],
                                   ref_enc.numpy()[b, :n],
                                   rtol=5e-4, atol=5e-4)
    got = np.asarray(got)
    for b, n in enumerate(np.asarray(tok_lens)):
        np.testing.assert_allclose(got[b, :n], ref_logits[b, :n],
                                   rtol=2e-3, atol=2e-3)


def test_uniasr_convert_tree():
    """uniasr_from_torch maps both passes onto our UniASR tree exactly
    (shape-checked leaf for leaf)."""
    from funasr_tpu.convert import uniasr_from_torch, check_tree_matches
    from funasr_tpu.models.uniasr.model import UniASR

    enc_m = load_reference("funasr.models.scama.encoder")
    dec_m = load_reference("funasr.models.scama.decoder")
    cifs = load_reference("funasr.models.paraformer.cif_predictor")

    def mk_enc(seed, input_size):
        torch.manual_seed(seed)
        e = enc_m.SANMEncoderChunkOpt(
            input_size=input_size, output_size=D, attention_heads=2,
            linear_units=32, num_blocks=3, dropout_rate=0.0,
            positional_dropout_rate=0.0, attention_dropout_rate=0.0,
            input_layer="pe", kernel_size=5, chunk_size=(12,), stride=(8,),
            pad_left=(0,), encoder_att_look_back_factor=(1,),
            decoder_att_look_back_factor=(1,))
        e.eval()
        return e

    enc1, enc2 = mk_enc(20, IN), mk_enc(21, IN + D)
    dec1, dec2 = _mk_scama_decoder(dec_m, 22), _mk_scama_decoder(dec_m, 23)
    pred1, pred2 = cifs.CifPredictorV2(**PRED), cifs.CifPredictorV2(**PRED)

    sd = {}
    for prefix, mod in (("encoder", enc1), ("decoder", dec1),
                        ("predictor", pred1), ("encoder2", enc2),
                        ("decoder2", dec2), ("predictor2", pred2)):
        for k, v in mod.state_dict().items():
            sd[f"{prefix}.{k}"] = v.detach().numpy()
    params = uniasr_from_torch(sd)

    ours = UniASR(vocab_size=V, input_size=IN, encoder_conf=ENC,
                  decoder_conf=dict(DEC, num_blocks=3), predictor_conf=PRED)
    x, lens = _speech(24)
    toks = jnp.zeros((2, 4), jnp.int32)

    def run(mdl, x_, lens_, toks_, tok_lens_):
        out = mdl.greedy_decode(x_, lens_, max_tokens=8)
        # touch both decoders' token embeds so the init tree covers the
        # reference checkpoint's embed tables (our NAR decode skips them)
        _ = mdl.decoder1.embed_tokens(toks_)
        _ = mdl.decoder2.embed_tokens(toks_)
        return out

    init = ours.init({"params": jax.random.PRNGKey(0)},
                     jnp.asarray(x), jnp.asarray(lens), toks,
                     jnp.array([4, 3], jnp.int32), method=run)
    assert check_tree_matches(params, init) == []

    # numeric spot check: pass-1 decode runs with converted weights
    out = ours.apply(params, jnp.asarray(x), jnp.asarray(lens),
                     max_tokens=8, method=ours.greedy_decode)
    assert out["pass1"][0].shape == (2, 8)
    assert out["pass2"][0].shape == (2, 8)

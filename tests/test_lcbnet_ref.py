"""Reference-architecture LCB-Net: converter + component parity vs the
actual reference torch modules (lcbnet/encoder.py)."""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, "tests")
torch = pytest.importorskip("torch")

from reference_torch import load_reference  # noqa: E402

V, D, H, FFN = 30, 16, 2, 32


def _enc_mod():
    return load_reference("funasr.models.lcbnet.encoder")


def test_text_encoder_parity():
    em = _enc_mod()
    torch.manual_seed(8)
    ref = em.TransformerTextEncoder(
        input_size=V, output_size=D, attention_heads=H, linear_units=FFN,
        num_blocks=2, dropout_rate=0.0, positional_dropout_rate=0.0,
        attention_dropout_rate=0.0)
    ref.eval()
    from funasr_tpu.convert import lcbnet_from_torch
    from funasr_tpu.models.lcbnet.reference_arch import LCBTextEncoder

    sd = {f"text_encoder.{k}": v.detach().numpy()
          for k, v in ref.state_dict().items()}
    te: dict = {}
    # reuse the full converter's text-encoder branch via a minimal sd
    sd["text_encoder.after_norm.weight"] = sd[
        "text_encoder.after_norm.weight"]
    from funasr_tpu.convert import _linear, _norm  # noqa

    ours = LCBTextEncoder(input_size=V, output_size=D, attention_heads=H,
                          linear_units=FFN, num_blocks=2)
    # build tree through lcbnet_from_torch-equivalent mapping
    tree = {"embed": {"embedding": sd["text_encoder.embed.0.weight"]}}
    for i in range(2):
        tp = f"text_encoder.encoders.{i}"
        _norm(sd, f"{tp}.norm1", tree, f"l{i}_norm1")
        _norm(sd, f"{tp}.norm2", tree, f"l{i}_norm2")
        for q in ("linear_q", "linear_k", "linear_v", "linear_out"):
            _linear(sd, f"{tp}.self_attn.{q}", tree, f"l{i}_self_attn/{q}")
        _linear(sd, f"{tp}.feed_forward.w_1", tree, f"l{i}_ff_w1")
        _linear(sd, f"{tp}.feed_forward.w_2", tree, f"l{i}_ff_w2")
    _norm(sd, "text_encoder.after_norm", tree, "after_norm")

    rng = np.random.default_rng(0)
    B, L = 2, 9
    ocr = rng.integers(1, V, (B, L)).astype(np.int64)
    lens = np.asarray([L, L - 3], np.int64)
    with torch.no_grad():
        want, wlens, _ = ref(torch.from_numpy(ocr), torch.from_numpy(lens))
    got, _ = ours.apply({"params": tree}, jnp.asarray(ocr, jnp.int32),
                        jnp.asarray(lens, jnp.int32))
    for b in range(B):
        np.testing.assert_allclose(np.asarray(got)[b, : int(lens[b])],
                                   want.numpy()[b, : int(lens[b])],
                                   atol=2e-4)


def test_fusion_and_bias_predictor_parity():
    em = _enc_mod()
    torch.manual_seed(9)
    fus = em.SelfSrcAttention(
        size=D, attention_heads=H, attention_dim=D, linear_units=FFN,
        self_attention_dropout_rate=0.0, src_attention_dropout_rate=0.0,
        positional_dropout_rate=0.0, dropout_rate=0.0)
    bias = em.ConvPredictor(size=D, l_order=2, r_order=2,
                            attention_heads=H, attention_dropout_rate=0.0,
                            linear_units=FFN)
    fus.eval(); bias.eval()
    from funasr_tpu.convert import lcbnet_from_torch
    from funasr_tpu.models.lcbnet.reference_arch import (
        ConvBiasPredictor, SelfSrcAttentionFusion)

    sd = {f"fusion_encoder.{k}": v.detach().numpy()
          for k, v in fus.state_dict().items()}
    sd.update({f"bias_predictor.{k}": v.detach().numpy()
               for k, v in bias.state_dict().items()})
    # dummy encoder/text keys not needed: map the two branches directly
    from funasr_tpu.convert import _linear, _norm, _set

    fu: dict = {}
    for nm in ("norm1", "norm2", "norm3"):
        _norm(sd, f"fusion_encoder.{nm}", fu, nm)
    for att in ("self_attn", "src_attn"):
        for q in ("linear_q", "linear_k", "linear_v", "linear_out"):
            _linear(sd, f"fusion_encoder.{att}.{q}", fu, f"{att}/{q}")
    _linear(sd, "fusion_encoder.feed_forward.w_1", fu, "ff_w1")
    _linear(sd, "fusion_encoder.feed_forward.w_2", fu, "ff_w2")
    bp: dict = {}
    for q in ("linear_q", "linear_k", "linear_v", "linear_out"):
        _linear(sd, f"bias_predictor.atten.{q}", bp, f"atten/{q}")
    _norm(sd, "bias_predictor.norm1", bp, "norm1")
    _norm(sd, "bias_predictor.norm2", bp, "norm2")
    _linear(sd, "bias_predictor.feed_forward.w_1", bp, "ff_w1")
    _linear(sd, "bias_predictor.feed_forward.w_2", bp, "ff_w2")
    _set(bp, "conv1d", np.ascontiguousarray(np.transpose(
        sd["bias_predictor.conv1d.weight"], (2, 1, 0))))
    _set(bp, "conv1d_bias", sd["bias_predictor.conv1d.bias"])
    _linear(sd, "bias_predictor.output_linear", bp, "output_linear")

    rng = np.random.default_rng(1)
    B, T, L = 2, 11, 7
    audio = rng.standard_normal((B, T, D)).astype(np.float32)
    text = rng.standard_normal((B, L, D)).astype(np.float32)
    with torch.no_grad():
        want, _, _, _ = fus(torch.from_numpy(audio), None,
                            torch.from_numpy(text), None)
        want_b = bias(torch.from_numpy(text), torch.from_numpy(audio))
    ours_f = SelfSrcAttentionFusion(size=D, attention_heads=H,
                                    linear_units=FFN)
    got = ours_f.apply({"params": fu}, jnp.asarray(audio), None,
                       jnp.asarray(text), None)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-4)
    ours_b = ConvBiasPredictor(size=D, l_order=2, r_order=2,
                               attention_heads=H, linear_units=FFN)
    got_b = ours_b.apply({"params": bp}, jnp.asarray(text),
                         jnp.asarray(audio))
    np.testing.assert_allclose(np.asarray(got_b), want_b.numpy(),
                               atol=2e-4)


def test_lcbnet_full_converter_and_biased_beam():
    """lcbnet_from_torch binds a full reference-layout state_dict
    (conformer audio encoder included) and the OCR-biased beam runs."""
    em = _enc_mod()
    ce = load_reference("funasr.models.conformer.encoder")
    td = load_reference("funasr.models.transformer.decoder")
    torch.manual_seed(10)
    IN = 20
    enc = ce.ConformerEncoder(
        input_size=IN, output_size=D, attention_heads=H, linear_units=FFN,
        num_blocks=1, dropout_rate=0.0, positional_dropout_rate=0.0,
        attention_dropout_rate=0.0, input_layer="conv2d",
        macaron_style=True, pos_enc_layer_type="rel_pos",
        selfattention_layer_type="rel_selfattn", activation_type="swish",
        use_cnn_module=True, cnn_module_kernel=5)
    tenc = em.TransformerTextEncoder(
        input_size=V, output_size=D, attention_heads=H, linear_units=FFN,
        num_blocks=1, dropout_rate=0.0, positional_dropout_rate=0.0,
        attention_dropout_rate=0.0)
    fus = em.SelfSrcAttention(
        size=D, attention_heads=H, attention_dim=D, linear_units=FFN,
        self_attention_dropout_rate=0.0, src_attention_dropout_rate=0.0,
        positional_dropout_rate=0.0, dropout_rate=0.0)
    bias = em.ConvPredictor(size=D, l_order=3, r_order=3,
                            attention_heads=H, attention_dropout_rate=0.0,
                            linear_units=FFN)
    dec = td.TransformerDecoder(
        vocab_size=V, encoder_output_size=D, attention_heads=H,
        linear_units=FFN, num_blocks=1, dropout_rate=0.0,
        positional_dropout_rate=0.0, self_attention_dropout_rate=0.0,
        src_attention_dropout_rate=0.0)
    sd = {}
    for prefix, mod in (("encoder", enc), ("text_encoder", tenc),
                        ("fusion_encoder", fus), ("bias_predictor", bias),
                        ("decoder", dec)):
        sd.update({f"{prefix}.{k}": v.detach().numpy()
                   for k, v in mod.state_dict().items()})
    sd["ctc.ctc_lo.weight"] = np.zeros((V, D), np.float32)
    sd["ctc.ctc_lo.bias"] = np.zeros((V,), np.float32)

    from funasr_tpu.convert import lcbnet_from_torch
    from funasr_tpu.models.lcbnet.reference_arch import LCBNetModel

    model = LCBNetModel(
        vocab_size=V, input_size=IN,
        encoder_conf=dict(output_size=D, attention_heads=H,
                          linear_units=FFN, num_blocks=1,
                          cnn_module_kernel=5, dropout_rate=0.0),
        text_encoder_conf=dict(attention_heads=H, linear_units=FFN,
                               num_blocks=1),
        fusion_encoder_conf=dict(attention_heads=H, linear_units=FFN),
        bias_predictor_conf=dict(l_order=3, r_order=3,
                                 attention_heads=H, linear_units=FFN),
        decoder_conf=dict(attention_heads=H, linear_units=FFN,
                          num_blocks=1, dropout_rate=0.0))
    n_after = ((IN - 1) // 2 - 1) // 2
    variables = lcbnet_from_torch(sd, n_after)

    rng = np.random.default_rng(2)
    B, T, L = 2, 23, 5
    speech = jnp.asarray(rng.standard_normal((B, T, IN)), jnp.float32)
    slens = jnp.asarray([T, T - 4], jnp.int32)
    ocr = jnp.asarray(rng.integers(1, V, (B, L)), jnp.int32)
    olens = jnp.asarray([L, L - 2], jnp.int32)
    fused, enc_lens, bias_scores = model.apply(
        variables, speech, slens, ocr, olens,
        method=model.encode_with_bias)
    assert np.all(np.isfinite(np.asarray(fused)))
    assert bias_scores.shape == (B, L)
    toks, lens_, scores = model.apply(
        variables, speech, slens, ocr, olens, beam=3, maxlen=6,
        method=model.decode_beam)
    assert toks.shape[:2] == (B, 3)

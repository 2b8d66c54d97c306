"""Reference-architecture MFCCA: converter + encoder/decoder parity vs the
actual reference torch modules (mfcca/mfcca_encoder.py, e2e_asr_mfcca.py)."""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, "tests")
torch = pytest.importorskip("torch")

from reference_torch import load_reference  # noqa: E402

IN, D, H, FFN, BLOCKS, V = 20, 16, 2, 32, 2, 24
C = 3  # channels


def _ref_encoder():
    me = load_reference("funasr.models.mfcca.mfcca_encoder")
    torch.manual_seed(5)
    enc = me.MFCCAEncoder(
        input_size=IN, output_size=D, attention_heads=H, linear_units=FFN,
        num_blocks=BLOCKS, dropout_rate=0.0, positional_dropout_rate=0.0,
        attention_dropout_rate=0.0, input_layer="conv2d",
        macaron_style=False, use_cnn_module=True, cnn_module_kernel=5)
    enc.eval()
    return enc


def _ours_from(enc_sd, dec_sd=None):
    from funasr_tpu.convert import mfcca_from_torch
    from funasr_tpu.models.mfcca.reference_arch import MFCCAModel

    sd = {f"encoder.{k}": v for k, v in enc_sd.items()}
    if dec_sd:
        sd.update({f"decoder.{k}": v for k, v in dec_sd.items()})
    model = MFCCAModel(
        vocab_size=V, input_size=IN,
        encoder_conf=dict(output_size=D, attention_heads=H,
                          linear_units=FFN, num_blocks=BLOCKS,
                          cnn_module_kernel=5, macaron_style=False),
        decoder_conf=dict(attention_heads=H, linear_units=FFN,
                          num_blocks=1, dropout_rate=0.0))
    n_mels_after = ((IN - 1) // 2 - 1) // 2
    variables = mfcca_from_torch(sd, n_mels_after)
    return model, variables


def test_mfcca_encoder_parity():
    """Encoder output (cross-channel attention + conformer blocks +
    channel-fusion convs) matches the reference to float tolerance."""
    ref = _ref_encoder()
    enc_sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    model, variables = _ours_from(enc_sd)

    rng = np.random.default_rng(0)
    B, T = 2, 23
    feats = rng.standard_normal((B * C, T, IN)).astype(np.float32)
    ilens = np.full((B * C,), T, np.int64)
    with torch.no_grad():
        want, wlens, _ = ref(torch.from_numpy(feats),
                             torch.from_numpy(ilens), C)
    got, olens = model.apply(
        variables, jnp.asarray(feats), jnp.asarray(ilens, jnp.int32), C,
        method=model.encode)
    want = want.numpy().reshape(got.shape)  # torch squeeze() quirk
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-4)
    np.testing.assert_array_equal(np.asarray(olens),
                                  wlens.numpy().astype(np.int64))


def test_mfcca_encoder_parity_fewer_channels_repeat():
    """channel_size < 8 repeats channels into the fusion convs exactly as
    the reference (repeat + [:8])."""
    ref = _ref_encoder()
    enc_sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    model, variables = _ours_from(enc_sd)
    rng = np.random.default_rng(1)
    B, T, C1 = 1, 19, 2
    feats = rng.standard_normal((B * C1, T, IN)).astype(np.float32)
    ilens = np.full((B * C1,), T, np.int64)
    with torch.no_grad():
        want, _, _ = ref(torch.from_numpy(feats), torch.from_numpy(ilens),
                         C1)
    got, _ = model.apply(variables, jnp.asarray(feats),
                         jnp.asarray(ilens, jnp.int32), C1,
                         method=model.encode)
    np.testing.assert_allclose(np.asarray(got),
                               want.numpy().reshape(got.shape), atol=3e-4)


def test_mfcca_loss_runs():
    ref = _ref_encoder()
    enc_sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    model, variables = _ours_from(enc_sd)
    # random-but-bindable decoder/ctc params: init then splice encoder
    rng = np.random.default_rng(2)
    B, T, U = 2, 23, 4
    feats = jnp.asarray(rng.standard_normal((B * C, T, IN)), jnp.float32)
    ilens = jnp.full((B * C,), T, jnp.int32)
    text = jnp.asarray(rng.integers(3, V, (B, U)), jnp.int32)
    tlens = jnp.asarray([U, U - 1], jnp.int32)
    full = model.init(jax.random.PRNGKey(0), feats, ilens, text, tlens,
                      channel_size=C)
    params = jax.tree_util.tree_map(lambda x: x, full)
    params["params"]["encoder"] = variables["params"]["encoder"]
    params["batch_stats"] = variables["batch_stats"]
    loss, stats = model.apply(params, feats, ilens, text, tlens,
                              channel_size=C)
    assert np.isfinite(float(loss))


def test_std_transformer_decoder_converter_parity():
    """_std_transformer_decoder_tree: the standard reference
    TransformerDecoder binds to models/transformer/decoder logits."""
    td = load_reference("funasr.models.transformer.decoder")
    torch.manual_seed(6)
    ref = td.TransformerDecoder(
        vocab_size=V, encoder_output_size=D, attention_heads=H,
        linear_units=FFN, num_blocks=2, dropout_rate=0.0,
        positional_dropout_rate=0.0, self_attention_dropout_rate=0.0,
        src_attention_dropout_rate=0.0)
    ref.eval()
    from funasr_tpu.convert import _std_transformer_decoder_tree
    from funasr_tpu.models.transformer.decoder import TransformerDecoder

    sd = {f"decoder.{k}": v.detach().numpy()
          for k, v in ref.state_dict().items()}
    tree = _std_transformer_decoder_tree(sd, "decoder")
    ours = TransformerDecoder(vocab_size=V, encoder_output_size=D,
                              attention_heads=H, linear_units=FFN,
                              num_blocks=2, dropout_rate=0.0)
    rng = np.random.default_rng(3)
    B, T, U = 2, 9, 5
    mem = rng.standard_normal((B, T, D)).astype(np.float32)
    mlens = np.asarray([T, T - 3], np.int64)
    ys = rng.integers(3, V, (B, U)).astype(np.int64)
    ylens = np.asarray([U, U - 2], np.int64)
    with torch.no_grad():
        want, _ = ref(torch.from_numpy(mem), torch.from_numpy(mlens),
                      torch.from_numpy(ys), torch.from_numpy(ylens))
    got = ours.apply({"params": tree}, jnp.asarray(mem),
                     jnp.asarray(mlens, jnp.int32), jnp.asarray(ys,
                                                                jnp.int32),
                     jnp.asarray(ylens, jnp.int32))
    # compare valid target rows of the valid batch entries
    for b in range(B):
        np.testing.assert_allclose(
            np.asarray(got)[b, : int(ylens[b])],
            want.numpy()[b, : int(ylens[b])], atol=3e-4)

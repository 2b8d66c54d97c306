"""Reference-architecture EEND-OLA: converter + logit parity vs the actual
reference torch model (eend/e2e_diar_eend_ola.py), plus the PSE decode and
training loss."""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, "tests")
torch = pytest.importorskip("torch")

from reference_torch import load_reference  # noqa: E402

IDIM, UNITS, LAYERS, H = 23 * 3, 32, 2, 2
MAXSPK = 8


def _ref_model():
    em = load_reference("funasr.models.eend.e2e_diar_eend_ola")
    enc_m = load_reference("funasr.models.eend.encoder")
    eda_m = load_reference("funasr.models.eend.encoder_decoder_attractor")
    torch.manual_seed(3)
    enc = enc_m.EENDOLATransformerEncoder(
        idim=IDIM, n_layers=LAYERS, n_units=UNITS, e_units=64, h=H,
        dropout_rate=0.0)
    eda = eda_m.EncoderDecoderAttractor(UNITS, encoder_dropout=0.0,
                                        decoder_dropout=0.0)
    model = em.DiarEENDOLAModel(frontend=None, encoder=enc,
                                encoder_decoder_attractor=eda,
                                n_units=UNITS, max_n_speaker=MAXSPK)
    model.eval()
    return model


def _ours(ref):
    from funasr_tpu.convert import eend_ola_from_torch
    from funasr_tpu.models.eend.eend_ola import DiarEENDOLAModel

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    m = DiarEENDOLAModel(idim=IDIM, n_layers=LAYERS, n_units=UNITS,
                         e_units=64, h=H, max_n_speaker=MAXSPK)
    m.params = eend_ola_from_torch(sd)
    return m


def test_eend_ola_estimate_parity():
    """estimate() == reference estimate_sequential(shuffle=False): same
    binary decision grids and same speaker counts."""
    ref = _ref_model()
    ours = _ours(ref)
    rng = np.random.default_rng(0)
    T = 40
    feats = rng.standard_normal((1, T, IDIM)).astype(np.float32)

    # n_speakers pinned: the reference's threshold branch IndexErrors
    # when no attractor prob is below threshold (random weights)
    with torch.no_grad():
        ys, emb, atts, n_spk = ref.estimate_sequential(
            [torch.from_numpy(feats[0])], shuffle=False, n_speakers=3)
    got = ours.estimate(feats, np.asarray([T]), n_speakers=3)
    assert got[0].shape == tuple(ys[0].shape), (got[0].shape, ys[0].shape)
    np.testing.assert_array_equal(got[0], ys[0].numpy())

    # intermediate parity: encoder embeddings
    with torch.no_grad():
        ref_emb = ref.forward_encoder([torch.from_numpy(feats[0])],
                                      torch.tensor([T]))[0].numpy()
    our_emb = np.asarray(ours._jit_fwd(
        ours.params, jnp.asarray(feats), jnp.asarray([T]))[0])[0]
    np.testing.assert_allclose(our_emb, ref_emb, atol=2e-4)


def test_eend_ola_estimate_fixed_speakers_batch():
    """Batched estimate with n_speakers forced; padded rows don't change
    the first utterance's output."""
    ref = _ref_model()
    ours = _ours(ref)
    rng = np.random.default_rng(1)
    f1 = rng.standard_normal((30, IDIM)).astype(np.float32)
    f2 = rng.standard_normal((18, IDIM)).astype(np.float32)
    feats = np.zeros((2, 30, IDIM), np.float32)
    feats[0] = f1
    feats[1, :18] = f2
    got = ours.estimate(feats, np.asarray([30, 18]), n_speakers=2)
    assert got[0].shape == (30, 2) and got[1].shape == (18, 2)
    solo = ours.estimate(f1[None], np.asarray([30]), n_speakers=2)
    np.testing.assert_array_equal(got[0], solo[0])


def test_eend_ola_loss_runs_and_is_finite():
    ours = _ours(_ref_model())
    rng = np.random.default_rng(2)
    feats = rng.standard_normal((2, 24, IDIM)).astype(np.float32)
    labels = (rng.random((2, 24, 3)) < 0.3).astype(np.float32)
    loss, stats = ours.loss(ours.params, feats, np.asarray([24, 20]),
                            labels, np.asarray([3, 2]))
    assert np.isfinite(float(loss))
    assert set(stats) == {"pit_loss", "pse_loss", "attractor_loss"}


def test_power_label_roundtrip():
    from funasr_tpu.models.eend.eend_ola import (create_powerlabel,
                                                 generate_mapping_dict)

    md = generate_mapping_dict(8)
    ref_power = load_reference("funasr.models.eend.utils.power")
    ref_md = ref_power.generate_mapping_dict(max_speaker_num=8)
    assert md["dec2label"] == ref_md["dec2label"]
    assert md["oov"] == ref_md["oov"]
    lab = np.zeros((5, 8), np.float32)
    lab[1, 0] = 1
    lab[2, [1, 3]] = 1
    lab[3, [0, 1, 2]] = 1
    got = create_powerlabel(lab, md, 8)
    want = ref_power.create_powerlabel(lab, ref_md, 8).numpy()
    np.testing.assert_array_equal(got, want)

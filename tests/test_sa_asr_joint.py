"""Joint SA-ASR (reference e2e_sa_asr.py wiring): loss, beam decode with
per-token speaker attribution, cosine-attention parity vs the reference
CosineDistanceAttention."""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, "tests")

V, IN, D, NSPK = 20, 16, 16, 4

CFG = dict(
    vocab_size=V, input_size=IN, max_spk_num=NSPK,
    encoder="TransformerEncoder",
    encoder_conf=dict(output_size=D, attention_heads=2, linear_units=32,
                      num_blocks=2, input_layer="linear",
                      dropout_rate=0.0),
    spk_encoder_conf=dict(input_size=IN, sp_l2reg=True,
                          num_nodes_pooling_layer=12,
                          layers_in_block=(1, 1, 1, 1),
                          filters_in_block=(2, 3, 4, 6),
                          num_nodes_resnet1=D, num_nodes_last_layer=D,
                          pool_size=4),
    decoder_conf=dict(attention_heads=2, linear_units=32, num_blocks=2,
                      spk_num_blocks=1),
    ctc_weight=0.3, spk_weight=0.5,
)


def _build():
    from funasr_tpu.models.sa_asr.joint_model import SAASRModel

    model = SAASRModel(**CFG)
    rng = np.random.default_rng(0)
    B, T, U = 2, 24, 6
    speech = jnp.asarray(rng.standard_normal((B, T, IN)), jnp.float32)
    slens = jnp.asarray([T, T - 6], jnp.int32)
    text = jnp.asarray(rng.integers(3, V, size=(B, U)), jnp.int32)
    tlens = jnp.asarray([U, U - 2], jnp.int32)
    profile = jnp.asarray(rng.standard_normal((B, NSPK, D)), jnp.float32)
    plens = jnp.asarray([NSPK, 3], jnp.int32)
    tid = jnp.asarray(rng.integers(0, 3, size=(B, U)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), speech, slens, text, tlens,
                        profile, plens, tid)
    return model, params, (speech, slens, text, tlens, profile, plens, tid)


def test_sa_asr_loss_and_grads():
    model, params, batch = _build()
    loss, stats = model.apply(params, *batch)
    assert np.isfinite(float(loss))
    assert set(stats) == {"loss_att", "loss_ctc", "loss_spk"}

    g = jax.grad(lambda p: model.apply(p, *batch)[0])(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)


def test_sa_asr_beam_decode_with_speakers():
    model, params, batch = _build()
    speech, slens, _, _, profile, plens, _ = batch
    toks, lens, scores, spk_ids = model.apply(
        params, speech, slens, profile, plens, beam=4, maxlen=8,
        decoding_ctc_weight=0.3, method=model.decode_beam)
    B = speech.shape[0]
    assert toks.shape[:2] == (B, 4)
    assert spk_ids.shape[0] == B
    # speaker ids index only valid (unmasked) profiles
    assert int(np.asarray(spk_ids[1]).max()) < int(plens[1])
    # scores sorted best-first
    s = np.asarray(scores)
    assert np.all(np.diff(s, axis=1) <= 1e-5)


def test_cosine_distance_attention_matches_reference():
    torch = pytest.importorskip("torch")
    from reference_torch import load_reference

    att = load_reference("funasr.models.sa_asr.attention")
    from funasr_tpu.models.sa_asr.joint_model import \
        cosine_distance_attention

    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 5, 8)).astype(np.float32)
    prof = rng.standard_normal((2, 4, 8)).astype(np.float32)
    plens = np.asarray([4, 2], np.int64)
    ref = att.CosineDistanceAttention()
    with torch.no_grad():
        w_emb, w = ref(torch.from_numpy(x), torch.from_numpy(prof),
                       torch.from_numpy(plens))
    emb_j, w_j = cosine_distance_attention(
        jnp.asarray(x), jnp.asarray(prof), jnp.asarray(plens))
    np.testing.assert_allclose(np.asarray(w_j), w.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(emb_j), w_emb.numpy(),
                               atol=1e-5)

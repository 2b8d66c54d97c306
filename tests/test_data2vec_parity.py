"""data2vec-1.0 encoder parity vs the reference torch implementation
(/root/reference/funasr/models/data2vec/)."""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, "tests")

torch = pytest.importorskip("torch")

from reference_torch import load_reference  # noqa: E402


def test_data2vec_extract_features_parity():
    from funasr_tpu.convert import data2vec_from_torch, check_tree_matches
    from funasr_tpu.models.data2vec import Data2VecEncoder

    dm = load_reference("funasr.models.data2vec.data2vec_encoder")
    torch.manual_seed(23)
    IN, D, FFN, H, L = 20, 16, 32, 2, 2
    ref = dm.Data2VecEncoder(
        input_size=IN, extractor_mode="default",
        conv_feature_layers="[(24,2,2)] + [(24,2,2)]",
        encoder_layers=L, encoder_embed_dim=D, encoder_ffn_embed_dim=FFN,
        encoder_attention_heads=H, dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0, dropout_input=0.0, dropout_features=0.0,
        conv_pos=8, conv_pos_groups=4,
    )
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = data2vec_from_torch(sd)

    ours = Data2VecEncoder(
        input_size=IN, conv_layers=((24, 2, 2), (24, 2, 2)),
        encoder_layers=L, encoder_embed_dim=D, encoder_ffn_embed_dim=FFN,
        encoder_attention_heads=H, conv_pos=8, conv_pos_groups=4)

    rng = np.random.default_rng(24)
    # T chosen so T' = T//4 is even (required_seq_len_multiple=2 pads
    # otherwise — padded frames are masked out but change nothing)
    x = rng.standard_normal((2, 64, IN)).astype(np.float32)
    lens = np.array([64, 48], np.int64)

    init = ours.init(jax.random.PRNGKey(0), jnp.asarray(x),
                     jnp.asarray(lens, jnp.int32),
                     method=ours.student_prediction,
                     frame_mask=jnp.zeros((2, 16), bool))
    assert check_tree_matches(params, init) == []

    with torch.no_grad():
        want_x, want_lens, _ = ref.extract_features(
            torch.from_numpy(x), torch.from_numpy(lens), mask=False)
        want_x = want_x.numpy()

    got, got_lens = ours.apply(params, jnp.asarray(x),
                               jnp.asarray(lens, jnp.int32),
                               method=ours.extract_features)
    got = np.asarray(got)
    assert got.shape == want_x.shape
    for b, n in enumerate(np.asarray(got_lens)):
        np.testing.assert_allclose(got[b, :n], want_x[b, :n],
                                   rtol=2e-3, atol=2e-4)

"""Sequence-parallel CIF vs ops.cif.cif — exact, incl. the tail frame."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from funasr_tpu.ops import cif as C
from funasr_tpu.parallel.mesh import make_mesh
from funasr_tpu.parallel.sp_cif import sp_cif


def _inputs(rng, B=2, T=64, D=8):
    hidden = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    alphas = jnp.asarray(rng.uniform(0.0, 0.9, (B, T)), jnp.float32)
    lengths = jnp.array([T - 3, T - 17][:B], jnp.int32)
    mask = (jnp.arange(T)[None, :] < lengths[:, None])
    return (hidden * mask[..., None], alphas * mask, lengths)


def test_sp_cif_matches_single_device(rng):
    hidden, alphas, lengths = _inputs(rng)
    U = 48
    want = C.cif(hidden, alphas, U)
    mesh = make_mesh(data=1, model=8)
    with mesh:
        got = jax.jit(lambda h, a, l: sp_cif(h, a, l, U, mesh))(
            hidden, alphas, lengths)
    np.testing.assert_allclose(np.asarray(got.embeds),
                               np.asarray(want.embeds), atol=1e-5,
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got.token_num),
                               np.asarray(want.token_num), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got.peaks),
                                  np.asarray(want.peaks))
    np.testing.assert_allclose(np.asarray(got.fires),
                               np.asarray(want.fires), atol=1e-5)


def test_sp_cif_tail_matches_cif_tail(rng):
    """tail_threshold applied in-shard equals ops.cif.cif_tail + cif
    (modulo cif_tail's +1 frame: the SP version writes the tail alpha into
    the first pad slot, which carries a zero hidden either way)."""
    hidden, alphas, lengths = _inputs(rng)
    U = 48
    h2, a2, tok_floor = C.cif_tail(hidden, alphas, lengths, 0.45)
    want = C.cif(h2, a2, U)
    mesh = make_mesh(data=1, model=8)
    with mesh:
        got = jax.jit(lambda h, a, l: sp_cif(h, a, l, U, mesh,
                                             tail_threshold=0.45))(
            hidden, alphas, lengths)
    np.testing.assert_allclose(np.asarray(got.embeds),
                               np.asarray(want.embeds), atol=1e-5,
                               rtol=1e-5)
    # inference contract: token_num is the FLOORED total (predictor.py:99)
    np.testing.assert_allclose(np.asarray(got.token_num),
                               np.asarray(tok_floor), atol=1e-5)


def test_sp_paraformer_greedy_bf16_token_agreement():
    """bf16 SP chain vs the bf16 single-device Paraformer: same
    mixed-precision recipe (bf16 matmuls, fp32 norms/softmax/CIF).
    Token lengths are exact; token agreement is thresholded (ring vs
    full attention reassociate bf16 sums, so near-tie argmaxes can flip
    — the same bound the int8 accuracy artifact uses)."""
    from funasr_tpu.models.paraformer.model import Paraformer
    from funasr_tpu.parallel.sp_cif import sp_paraformer_greedy
    from funasr_tpu.ops import quant

    quant.enable(False)
    rng = np.random.default_rng(0)
    ENC = dict(output_size=16, attention_heads=2, linear_units=32,
               num_blocks=2, kernel_size=5, dropout_rate=0.0,
               attention_dropout_rate=0.0)
    DEC = dict(attention_heads=2, linear_units=32, num_blocks=2,
               att_layer_num=1, kernel_size=5, dropout_rate=0.0)
    PRED = dict(idim=16, tail_threshold=0.45, dropout=0.0)
    model = Paraformer(vocab_size=32, input_size=24, encoder_conf=ENC,
                       decoder_conf=DEC, predictor_conf=PRED,
                       dtype=jnp.bfloat16)
    B, T = 2, 64
    speech = jnp.asarray(rng.standard_normal((B, T, 24)), jnp.float32)
    lengths = jnp.array([T - 3, T - 14], jnp.int32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, speech,
                           lengths, max_tokens=32,
                           method=model.greedy_decode)
    want_tok, want_len, _ = model.apply(
        variables, speech, lengths, max_tokens=32,
        method=model.greedy_decode)
    mesh = make_mesh(data=1, model=8)
    with mesh:
        got_tok, got_len, _ = jax.jit(
            lambda v, s, l: sp_paraformer_greedy(
                v, s, l, mesh, enc_conf=ENC, dec_conf=DEC,
                pred_conf=PRED, max_tokens=32,
                dtype=jnp.bfloat16))(variables, speech, lengths)
    np.testing.assert_array_equal(np.asarray(got_len),
                                  np.asarray(want_len))
    agree = float(np.mean(np.asarray(got_tok) == np.asarray(want_tok)))
    assert agree >= 0.93, f"bf16 token agreement {agree:.3f} < 0.93"


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 5])
def test_sp_paraformer_greedy_full_chain(seed):
    """Flagship-shaped-but-tiny full SP inference: encoder -> predictor ->
    CIF -> decoder sharded over 8 devices must reproduce
    Paraformer.greedy_decode exactly (tokens, lengths, scores).

    Parametrized over seeds: the tail token_num floor (sp_cif vs round)
    only diverges when the fractional alpha mass lands >= 0.5, which
    seed 0 alone never hits.
    """
    rng = np.random.default_rng(seed)
    full_len = seed == 2  # exercise lengths == T (tail in the pad block)
    from funasr_tpu.models.paraformer.model import Paraformer
    from funasr_tpu.parallel.sp_cif import sp_paraformer_greedy
    from funasr_tpu.ops import quant

    quant.enable(False)
    ENC = dict(output_size=16, attention_heads=2, linear_units=32,
               num_blocks=2, kernel_size=5, dropout_rate=0.0,
               attention_dropout_rate=0.0)
    DEC = dict(attention_heads=2, linear_units=32, num_blocks=2,
               att_layer_num=1, kernel_size=5, dropout_rate=0.0)
    PRED = dict(idim=16, tail_threshold=0.45, dropout=0.0)
    model = Paraformer(vocab_size=32, input_size=24, encoder_conf=ENC,
                       decoder_conf=DEC, predictor_conf=PRED)
    B, T = 2, 64
    speech = jnp.asarray(rng.standard_normal((B, T, 24)), jnp.float32)
    lengths = (jnp.array([T, T - 14], jnp.int32) if full_len
               else jnp.array([T - 3, T - 14], jnp.int32))
    variables = model.init({"params": jax.random.PRNGKey(0)}, speech,
                           lengths, max_tokens=32,
                           method=model.greedy_decode)
    want_tok, want_len, want_sc = model.apply(
        variables, speech, lengths, max_tokens=32,
        method=model.greedy_decode)

    mesh = make_mesh(data=1, model=8)
    with mesh:
        got_tok, got_len, got_sc = jax.jit(
            lambda v, s, l: sp_paraformer_greedy(
                v, s, l, mesh, enc_conf=ENC, dec_conf=DEC,
                pred_conf=PRED, max_tokens=32))(variables, speech, lengths)
    np.testing.assert_array_equal(np.asarray(got_len),
                                  np.asarray(want_len))
    np.testing.assert_array_equal(np.asarray(got_tok),
                                  np.asarray(want_tok))
    np.testing.assert_allclose(np.asarray(got_sc), np.asarray(want_sc),
                               atol=1e-3)

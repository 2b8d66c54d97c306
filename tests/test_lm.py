"""TransformerLM + shallow fusion in the beam search."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from funasr_tpu.models.language_model import TransformerLM
from funasr_tpu.ops.beam_search import beam_search


def test_lm_forward_and_loss(rng):
    lm = TransformerLM(vocab_size=20, embed_unit=8, att_unit=16, head=2,
                       unit=32, layer=2, dropout_rate=0.0)
    tokens = jnp.asarray(rng.integers(3, 20, (2, 10)), jnp.int32)
    lens = jnp.array([10, 7])
    params = lm.init({"params": jax.random.PRNGKey(0)}, tokens, lens)
    logits = lm.apply(params, tokens, lens)
    assert logits.shape == (2, 10, 20)
    loss = lm.apply(params, tokens, lens, deterministic=True, method=lm.loss)
    assert np.isfinite(float(loss))
    # untrained NLL should be near log(V)
    assert abs(float(loss) - np.log(20)) < 1.0


@pytest.mark.parametrize("rnn_type", ["lstm", "gru", "rnn_tanh"])
def test_seq_rnn_lm_forward_and_loss(rng, rnn_type):
    from funasr_tpu.models.language_model import SequentialRNNLM

    lm = SequentialRNNLM(vocab_size=20, unit=16, nlayers=2,
                         dropout_rate=0.0, rnn_type=rnn_type)
    tokens = jnp.asarray(rng.integers(3, 20, (2, 10)), jnp.int32)
    lens = jnp.array([10, 7])
    params = lm.init({"params": jax.random.PRNGKey(0)}, tokens, lens)
    logits = lm.apply(params, tokens, lens)
    assert logits.shape == (2, 10, 20)
    loss = lm.apply(params, tokens, lens, deterministic=True, method=lm.loss)
    assert np.isfinite(float(loss))
    assert abs(float(loss) - np.log(20)) < 1.0


def test_seq_rnn_lm_tied_weights(rng):
    from funasr_tpu.models.language_model import SequentialRNNLM

    lm = SequentialRNNLM(vocab_size=12, unit=16, nlayers=1,
                         dropout_rate=0.0, tie_weights=True)
    tokens = jnp.asarray(rng.integers(1, 12, (2, 6)), jnp.int32)
    lens = jnp.array([6, 4])
    params = lm.init({"params": jax.random.PRNGKey(0)}, tokens, lens)
    # no separate decoder matrix when tied
    assert "decoder" not in params["params"]
    assert lm.apply(params, tokens, lens).shape == (2, 6, 12)


def test_beam_with_lm_fusion(rng):
    """LM that strongly prefers token 3 shifts the beam result."""
    V, maxlen, K, sos, eos = 6, 3, 3, 1, 2
    flat = np.full((V,), np.log(1.0 / V), np.float32)

    def decode_fn(ys, step):
        return jnp.broadcast_to(jnp.asarray(flat)[None], (ys.shape[0], V))

    lm_bias = np.full((V,), -5.0, np.float32)
    lm_bias[3] = -0.01
    lm_bias[eos] = -0.5

    def lm_fn(ys, step):
        return jnp.broadcast_to(jnp.asarray(lm_bias)[None], (ys.shape[0], V))

    res_no = beam_search(decode_fn, 1, K, V, sos, eos, maxlen)
    res_lm = beam_search(decode_fn, 1, K, V, sos, eos, maxlen,
                         lm_fn=lm_fn, lm_weight=1.0)
    toks = np.asarray(res_lm.tokens[0, 0])
    n = int(res_lm.lengths[0, 0])
    # with the LM, all emitted non-eos tokens should be 3
    assert all(t == 3 for t in toks[:n])

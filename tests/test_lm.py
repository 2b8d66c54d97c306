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


def test_beam_with_cached_lm_matches_full_prefix(rng):
    """CachedTransformerLM shallow fusion == the full-prefix lm_fn on a
    REAL TransformerLM — same hypotheses and scores (the LM twin of the
    cached-decoder parity test)."""
    from funasr_tpu.models.language_model import TransformerLM
    from funasr_tpu.ops.cached_decoder import CachedTransformerLM

    V, maxlen, B, K, sos, eos = 10, 6, 2, 3, 1, 2
    lm = TransformerLM(vocab_size=V, embed_unit=8, att_unit=16, head=2,
                       unit=32, layer=2, dropout_rate=0.0)
    toks0 = jnp.asarray(rng.integers(1, V, (1, 4)), jnp.int32)
    vs = lm.init({"params": jax.random.PRNGKey(0),
                  "dropout": jax.random.PRNGKey(1)}, toks0,
                 jnp.array([4]))

    # a decode_fn with per-step structure so the beam isn't degenerate
    base = jnp.asarray(rng.standard_normal((maxlen + 1, V)), jnp.float32)

    def decode_fn(ys, step):
        row = jax.nn.log_softmax(base[step])
        return jnp.broadcast_to(row[None], (ys.shape[0], V))

    def lm_fn(ys, step):
        L = ys.shape[1]
        lens = jnp.full((ys.shape[0],), L, jnp.int32)
        logits = lm.apply(vs, ys, lens)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        return jnp.take_along_axis(
            logp, jnp.broadcast_to(step[None, None, None],
                                   (ys.shape[0], 1, 1)), axis=1)[:, 0]

    scorer = CachedTransformerLM(vs["params"], B * K, n_head=2,
                                 maxlen=maxlen)
    full = beam_search(decode_fn, B, K, V, sos, eos, maxlen,
                       lm_fn=lm_fn, lm_weight=0.7)
    cached = beam_search(decode_fn, B, K, V, sos, eos, maxlen,
                         lm_step_fn=scorer.step,
                         lm_state=scorer.init_state(),
                         lm_reorder_fn=CachedTransformerLM.reorder_state,
                         lm_weight=0.7)
    np.testing.assert_array_equal(np.asarray(cached.tokens),
                                  np.asarray(full.tokens))
    np.testing.assert_allclose(np.asarray(cached.scores),
                               np.asarray(full.scores), rtol=1e-5,
                               atol=1e-5)

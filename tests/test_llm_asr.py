"""LLM-ASR: adaptor, prefix-LM masking, loss, greedy decode."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from funasr_tpu.models.llm_asr.model import Adaptor, LLMASR

CFG = dict(
    vocab_size=12, input_size=20,
    encoder_conf=dict(output_size=16, attention_heads=2, linear_units=32,
                      num_blocks=2, kernel_size=5, dropout_rate=0.0),
    adaptor_conf=dict(k=2, hidden=24, llm_dim=16),
    llm_conf=dict(dim=16, heads=2, ffn=32, layers=2),
)


def test_adaptor_downsamples(rng):
    ad = Adaptor(k=3, hidden=8, llm_dim=6)
    x = jnp.asarray(rng.standard_normal((2, 10, 4)), jnp.float32)
    lens = jnp.array([10, 7], jnp.int32)
    params = ad.init(jax.random.PRNGKey(0), x, lens)
    out, olens = ad.apply(params, x, lens)
    assert out.shape == (2, 3, 6)
    assert olens.tolist() == [3, 2]


@pytest.fixture(scope="module")
def llm_asr():
    model = LLMASR(**CFG)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 24, 20)), jnp.float32)
    lens = jnp.array([24, 16], jnp.int32)
    text = jnp.array([[3, 4, 5], [6, 7, 0]], jnp.int32)
    tlens = jnp.array([3, 2], jnp.int32)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, lens, text, tlens)
    return model, params, (x, lens, text, tlens)


def test_loss_finite_and_grad(llm_asr):
    model, params, (x, lens, text, tlens) = llm_asr

    def lf(p):
        loss, _ = model.apply(p, x, lens, text, tlens, deterministic=True)
        return loss

    loss, grads = jax.value_and_grad(lf)(params)
    assert np.isfinite(float(loss))
    gsum = jax.tree_util.tree_reduce(
        lambda a, g: a + float(jnp.sum(jnp.abs(g))), grads, 0.0)
    assert gsum > 0


def test_padded_text_does_not_change_loss(llm_asr):
    model, params, (x, lens, text, tlens) = llm_asr
    loss1, _ = model.apply(params, x, lens, text, tlens, deterministic=True)
    text2 = text.at[1, 2].set(9)  # padded position
    loss2, _ = model.apply(params, x, lens, text2, tlens, deterministic=True)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-6)


@pytest.fixture(scope="module")
def llm_asr_nar():
    from funasr_tpu.models.llm_asr.model import LLMASRNAR

    cfg = dict(CFG, adaptor_conf=dict(hidden=24, llm_dim=16))  # k defaults to 1
    model = LLMASRNAR(predictor_conf=dict(idim=16, dropout=0.0), **cfg)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 24, 20)), jnp.float32)
    lens = jnp.array([24, 16], jnp.int32)
    text = jnp.array([[3, 4, 5], [6, 7, 0]], jnp.int32)
    tlens = jnp.array([3, 2], jnp.int32)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, lens, text, tlens)
    return model, params, (x, lens, text, tlens)


def test_nar_loss_and_grad(llm_asr_nar):
    model, params, (x, lens, text, tlens) = llm_asr_nar

    def lf(p):
        loss, _ = model.apply(p, x, lens, text, tlens, deterministic=True)
        return loss

    loss, grads = jax.value_and_grad(lf)(params)
    assert np.isfinite(float(loss))
    gsum = jax.tree_util.tree_reduce(
        lambda a, g: a + float(jnp.sum(jnp.abs(g))), grads, 0.0)
    assert gsum > 0
    # CIF predictor and LLM stack both receive gradient
    for key in ("predictor", "llm_layers"):
        sub = jax.tree_util.tree_reduce(
            lambda a, g: a + float(jnp.sum(jnp.abs(g))),
            grads["params"][key], 0.0)
        assert sub > 0, key


def test_nar_padded_text_invariance(llm_asr_nar):
    model, params, (x, lens, text, tlens) = llm_asr_nar
    loss1, _ = model.apply(params, x, lens, text, tlens, deterministic=True)
    text2 = text.at[1, 2].set(9)  # padded position
    loss2, _ = model.apply(params, x, lens, text2, tlens, deterministic=True)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-6)


def test_nar_decode_single_forward(llm_asr_nar):
    model, params, (x, lens, _, _) = llm_asr_nar
    toks, n = jax.jit(
        lambda p, x, l: model.apply(p, x, l, max_tokens=8,
                                    method=model.nar_decode)
    )(params, x, lens)
    assert toks.shape == (2, 8)
    assert (np.asarray(n) >= 0).all() and (np.asarray(n) <= 8).all()
    assert np.asarray(toks).max() < 12
    # shorter utterance fires fewer CIF tokens
    assert int(n[1]) <= int(n[0])


def test_greedy_decode(llm_asr):
    model, params, (x, lens, _, _) = llm_asr
    toks, tok_lens = jax.jit(
        lambda p, x, l: model.apply(p, x, l, maxlen=6,
                                    method=model.greedy_decode)
    )(params, x, lens)
    assert toks.shape == (2, 6)
    assert (np.asarray(tok_lens) <= 6).all()
    assert np.asarray(toks).max() < 12


@pytest.mark.parametrize("adaptor,aconf", [
    ("Transformer", dict(downsample_rate=2, ffn_dim=24, n_layer=1, heads=2)),
    ("QFormer", dict(query_len=4, qformer_dim=16, n_layer=1, heads=2,
                     n_windows=2)),
])
def test_llm_asr_adaptors(rng, adaptor, aconf):
    """Adaptor selectable by registry name (reference adaptor_classes)."""
    from funasr_tpu.models.llm_asr.model import LLMASR

    cfg = dict(CFG)
    cfg.pop("adaptor_conf")
    model = LLMASR(adaptor=adaptor, adaptor_conf=aconf, **cfg)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((2, 24, 20)),
                    jnp.float32)
    lens = jnp.array([24, 16], jnp.int32)
    text = jnp.array([[3, 4, 5], [6, 7, 0]], jnp.int32)
    tlens = jnp.array([3, 2], jnp.int32)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, lens, text, tlens)
    loss, stats = model.apply(params, x, lens, text, tlens,
                              deterministic=True)
    assert np.isfinite(float(loss))
    toks, n = model.apply(params, x, lens, maxlen=4,
                          method=model.greedy_decode)
    assert toks.shape == (2, 4)

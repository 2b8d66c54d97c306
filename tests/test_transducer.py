"""RNN-T loss vs. exhaustive path-sum oracle + transducer model tests."""

import itertools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from funasr_tpu.models.transducer.model import Transducer
from funasr_tpu.ops.rnnt import rnnt_loss


def rnnt_oracle(logits, targets, blank=0):
    """Sum probability over all monotonic alignments (exhaustive DP in
    float64, prob domain).  logits: (T, U+1, V); targets: (U,)."""
    T, U1, V = logits.shape
    U = U1 - 1
    p = np.exp(logits.astype(np.float64)
               - np.log(np.exp(logits.astype(np.float64)).sum(-1, keepdims=True)))
    alpha = np.zeros((T, U1))
    alpha[0, 0] = 1.0
    for u in range(1, U1):
        alpha[0, u] = alpha[0, u - 1] * p[0, u - 1, targets[u - 1]]
    for t in range(1, T):
        alpha[t, 0] = alpha[t - 1, 0] * p[t - 1, 0, blank]
        for u in range(1, U1):
            alpha[t, u] = (alpha[t - 1, u] * p[t - 1, u, blank]
                           + alpha[t, u - 1] * p[t, u - 1, targets[u - 1]])
    return -np.log(alpha[T - 1, U] * p[T - 1, U, blank])


def test_rnnt_loss_matches_oracle(rng):
    B, T, U, V = 3, 6, 4, 5
    logits = rng.standard_normal((B, T, U + 1, V)).astype(np.float32) * 1.5
    targets = rng.integers(1, V, (B, U)).astype(np.int32)
    t_lens = np.array([6, 5, 4], np.int32)
    u_lens = np.array([4, 3, 2], np.int32)
    got = float(rnnt_loss(jnp.asarray(logits), jnp.asarray(targets),
                          jnp.asarray(t_lens), jnp.asarray(u_lens)))
    want = np.mean([
        rnnt_oracle(logits[b, : t_lens[b], : u_lens[b] + 1],
                    targets[b, : u_lens[b]])
        for b in range(B)
    ])
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_rnnt_loss_grad_finite(rng):
    B, T, U, V = 2, 5, 3, 6
    logits = jnp.asarray(rng.standard_normal((B, T, U + 1, V)), jnp.float32)
    targets = jnp.asarray(rng.integers(1, V, (B, U)), jnp.int32)
    g = jax.grad(lambda x: rnnt_loss(x, targets, jnp.array([5, 4]),
                                     jnp.array([3, 2])))(logits)
    assert np.isfinite(np.asarray(g)).all()


CONF = dict(
    vocab_size=16,
    input_size=20,
    encoder_conf=dict(output_size=16, attention_heads=2, linear_units=32,
                      num_blocks=2, cnn_module_kernel=7, dropout_rate=0.0),
    decoder_conf=dict(embed_size=16, hidden_size=16),
    joint_conf=dict(joint_size=16),
)


def test_transducer_train_and_greedy(rng):
    model = Transducer(**CONF)
    B, T, U = 2, 40, 5
    speech = jnp.asarray(rng.standard_normal((B, T, 20)), jnp.float32)
    slens = jnp.array([T, T - 8])
    text = jnp.asarray(rng.integers(1, 16, (B, U)), jnp.int32)
    tlens = jnp.array([U, U - 2])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        speech, slens, text, tlens)
    (loss, stats), _ = model.apply(
        variables, speech, slens, text, tlens, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(2)}, mutable=["batch_stats"])
    assert np.isfinite(float(loss))

    tokens, counts = model.apply(variables, speech, slens, max_tokens=16,
                                 method=model.greedy_decode)
    assert tokens.shape == (B, 16)
    assert (np.asarray(counts) <= 16).all()
    # no blanks among emitted tokens
    toks = np.asarray(tokens)
    for b in range(B):
        assert (toks[b, : int(counts[b])] != 0).all()

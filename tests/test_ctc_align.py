"""CTC forced alignment: brute-force optimality + batching semantics."""

import itertools

import numpy as np
import jax.numpy as jnp
import pytest

from funasr_tpu.ops.ctc_align import ctc_forced_align


def _collapse(path, blank=0):
    out = []
    prev = None
    for p in path:
        if p != blank and p != prev:
            out.append(p)
        prev = p
    return out


def _brute_best(lp, target, blank=0):
    """Enumerate all frame label sequences that CTC-collapse to target."""
    T, C = lp.shape
    best, best_s = None, -np.inf
    for path in itertools.product(range(C), repeat=T):
        if _collapse(path, blank) != list(target):
            continue
        s = sum(lp[t, path[t]] for t in range(T))
        if s > best_s:
            best, best_s = path, s
    return list(best), best_s


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_matches_brute_force(seed):
    rng = np.random.default_rng(seed)
    T, C = 6, 4
    target = [1, 2]
    lp = np.log(rng.dirichlet(np.ones(C), size=T))
    want, want_s = _brute_best(lp, target)
    got = np.asarray(ctc_forced_align(
        jnp.asarray(lp[None]), jnp.asarray([target]),
        jnp.asarray([T]), jnp.asarray([2])))[0]
    got_s = sum(lp[t, got[t]] for t in range(T))
    # score-equal optima are acceptable (ties)
    assert _collapse(got) == target
    np.testing.assert_allclose(got_s, want_s, atol=1e-5)


def test_repeated_label_needs_blank():
    # target [1, 1]: a blank MUST separate the two emissions
    T, C = 5, 3
    lp = np.full((T, C), np.log(0.1))
    lp[:, 1] = np.log(0.8)  # label 1 always most likely
    got = np.asarray(ctc_forced_align(
        jnp.asarray(lp[None]), jnp.asarray([[1, 1]]),
        jnp.asarray([T]), jnp.asarray([2])))[0]
    assert _collapse(got) == [1, 1]


def test_batched_lengths_and_padding():
    rng = np.random.default_rng(3)
    T, C, U = 8, 5, 3
    lp = np.log(rng.dirichlet(np.ones(C), size=(2, T)))
    targets = np.array([[1, 2, 3], [4, 1, 0]])  # row 1: only 2 labels
    ilens = np.array([8, 5])
    tlens = np.array([3, 2])
    got = np.asarray(ctc_forced_align(
        jnp.asarray(lp), jnp.asarray(targets),
        jnp.asarray(ilens), jnp.asarray(tlens)))
    assert _collapse(got[0, :8].tolist()) == [1, 2, 3]
    assert _collapse(got[1, :5].tolist()) == [4, 1]
    assert (got[1, 5:] == 0).all()  # pad frames blank
    # per-row brute-force optimality on the valid prefix
    want1, s1 = _brute_best(lp[1, :5], [4, 1])
    gs = sum(lp[1, t, got[1, t]] for t in range(5))
    np.testing.assert_allclose(gs, s1, atol=1e-5)


def test_prob_domain_scores_work():
    """The reference passes SOFTMAX probabilities (not logs) — additive
    Viterbi still yields a valid alignment (quirk reproduced by the
    SenseVoice timestamp path)."""
    rng = np.random.default_rng(4)
    probs = rng.dirichlet(np.ones(4), size=(1, 7))
    got = np.asarray(ctc_forced_align(
        jnp.asarray(probs), jnp.asarray([[2, 3]]),
        jnp.asarray([7]), jnp.asarray([2])))[0]
    assert _collapse(got.tolist()) == [2, 3]

"""Hotword prefix-tree bias: trie semantics + beam-search integration."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from funasr_tpu.ops.beam_search import beam_search
from funasr_tpu.ops.hotword import bias_path_score, build_bias_trie


def test_trie_scores():
    V = 10
    ns, sc = build_bias_trie([[3, 4, 5], [3, 7]], V, bonus=2.0)
    # completing a hotword earns bonus per token
    assert bias_path_score(ns, sc, [3, 4, 5]) == pytest.approx(6.0)
    assert bias_path_score(ns, sc, [3, 7]) == pytest.approx(4.0)
    # abandoning a partial match cancels the credit
    assert bias_path_score(ns, sc, [3, 4, 9]) == pytest.approx(0.0)
    # non-hotword tokens are score-neutral
    assert bias_path_score(ns, sc, [9, 8, 9]) == pytest.approx(0.0)
    # completed credit is kept even when followed by other tokens
    assert bias_path_score(ns, sc, [3, 4, 5, 9]) == pytest.approx(6.0)


def test_trie_nested_commit():
    # "ab" terminal and "abc" terminal: committing at 'b' survives dropping c
    ns, sc = build_bias_trie([[1, 2], [1, 2, 3]], 6, bonus=1.0)
    assert bias_path_score(ns, sc, [1, 2]) == pytest.approx(2.0)
    assert bias_path_score(ns, sc, [1, 2, 3]) == pytest.approx(3.0)
    # after committing "ab", a non-c token does not cancel the 2.0
    assert bias_path_score(ns, sc, [1, 2, 5]) == pytest.approx(2.0)


def test_beam_search_hotword_steering():
    """A flat AM distribution: the hotword path must win the beam only
    when biasing is on."""
    V, sos, eos, maxlen = 8, 1, 2, 4

    def decode_fn(ys, step):
        # mildly prefer token 6; eos strongly discouraged
        logp = jnp.full((ys.shape[0], V), -3.0)
        logp = logp.at[:, 6].set(-2.0)
        logp = logp.at[:, eos].set(-10.0)
        return logp

    res_plain = beam_search(decode_fn, 1, 4, V, sos, eos, maxlen)
    tables = build_bias_trie([[4, 5, 3]], V, bonus=2.0)
    res_hw = beam_search(decode_fn, 1, 4, V, sos, eos, maxlen,
                         hotword_tables=tables)
    top_plain = np.asarray(res_plain.tokens[0, 0])
    top_hw = np.asarray(res_hw.tokens[0, 0])
    assert list(top_hw[:3]) == [4, 5, 3]
    assert list(top_plain[:3]) != [4, 5, 3]

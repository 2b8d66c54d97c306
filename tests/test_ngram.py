"""ARPA n-gram LM: parsing, backoff math, n-best rescoring."""

import math

import numpy as np
import pytest

from funasr_tpu.models.ngram_lm import NgramLM

ARPA = """\\data\\
ngram 1=5
ngram 2=3

\\1-grams:
-1.0\t<s>\t-0.5
-1.0\t</s>
-0.6\t3\t-0.3
-0.9\t4\t-0.2
-1.2\t5

\\2-grams:
-0.2\t3 4
-0.4\t4 5
-0.5\t3 3

\\end\\
"""


@pytest.fixture()
def lm(tmp_path):
    p = tmp_path / "lm.arpa"
    p.write_text(ARPA)
    return NgramLM(str(p))


def test_unigram_and_bigram(lm):
    L = math.log(10.0)
    assert lm.logp([], 3) == pytest.approx(-0.6 * L)
    assert lm.logp([3], 4) == pytest.approx(-0.2 * L)  # seen bigram
    # unseen bigram (4 -> 3): backoff(4) + unigram(3)
    assert lm.logp([4], 3) == pytest.approx((-0.2 - 0.6) * L)
    # context longer than order-1 truncates
    assert lm.logp([5, 3], 4) == pytest.approx(-0.2 * L)


def test_score_ids_additivity(lm):
    s = lm.score_ids([3, 4], bos=False)
    assert s == pytest.approx(lm.logp([], 3) + lm.logp([3], 4))


def test_rescore_nbest_changes_order(lm):
    # hyp0 = [4, 3] (backoff-penalized), hyp1 = [3, 4] (good bigram)
    hyps = np.array([[[4, 3], [3, 4]]])
    lengths = np.array([[2, 2]])
    am = np.array([[0.05, 0.0]])  # AM slightly prefers the bad path
    order, fused = lm.rescore_nbest(hyps, lengths, am, lm_weight=1.0)
    assert order[0, 0] == 1  # LM flips the ranking
    assert fused[0, 0] >= fused[0, 1]


def test_step_scores_dense(lm):
    v = lm.step_scores([3], vocab=6)
    assert v.shape == (6,)
    assert v[4] == pytest.approx(-0.2 * math.log(10))

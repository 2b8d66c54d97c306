"""Golden tests: JAX frontend vs independent NumPy kaldi oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from funasr_tpu.ops import fbank as F
from tests import kaldi_ref


def _wavs(rng, B=3, N=16000):
    wav = rng.standard_normal((B, N)).astype(np.float32) * 0.1
    lengths = np.array([N, N - 1500, N // 2], dtype=np.int32)[:B]
    for b in range(B):
        wav[b, lengths[b]:] = 0.0
    return wav, lengths


def test_fbank_matches_kaldi_oracle(rng):
    wav, lengths = _wavs(rng)
    feats, feat_lens = F.fbank(jnp.asarray(wav), jnp.asarray(lengths), dither=0.0)
    feats = np.asarray(feats)
    for b in range(len(lengths)):
        ref = kaldi_ref.fbank_single(wav[b, : lengths[b]].astype(np.float64) * (1 << 15))
        n = ref.shape[0]
        assert feat_lens[b] == n
        np.testing.assert_allclose(feats[b, :n], ref, rtol=2e-4, atol=2e-3)


def test_fbank_frame_count_formula():
    # 1s @ 16k, 25ms/10ms snip_edges -> 98 frames
    assert F.num_fbank_frames(16000, 400, 160) == 98
    assert F.num_fbank_frames(400, 400, 160) == 1
    assert F.num_fbank_frames(399, 400, 160) == 0


def test_lfr_matches_oracle(rng):
    B, T, D = 2, 53, 6
    feats = rng.standard_normal((B, T, D)).astype(np.float32)
    lens = np.array([T, T - 10], dtype=np.int32)
    out, out_lens = F.apply_lfr(jnp.asarray(feats), jnp.asarray(lens), 7, 6)
    out = np.asarray(out)
    for b in range(B):
        ref = kaldi_ref.apply_lfr_single(feats[b, : lens[b]], 7, 6)
        assert out_lens[b] == ref.shape[0]
        np.testing.assert_allclose(out[b, : ref.shape[0]], ref, rtol=1e-6)


def test_cmvn():
    cmvn = np.stack([np.full((4,), 2.0), np.full((4,), 0.5)]).astype(np.float32)
    x = np.ones((1, 3, 4), np.float32)
    out = F.apply_cmvn(jnp.asarray(x), jnp.asarray(cmvn))
    np.testing.assert_allclose(np.asarray(out), (1 + 2) * 0.5)


def test_mel_banks_shape_and_partition():
    banks = F.kaldi_mel_banks(80, 512, 16000.0)
    assert banks.shape == (257, 80)
    assert banks[-1].sum() == 0.0  # nyquist column zero
    # triangles overlap and tile the band: row sums near 1 in the interior
    interior = banks[20:200].sum(axis=1)
    assert (interior > 0.2).all()

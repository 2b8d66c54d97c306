"""Streaming Paraformer: frontend chunk==offline equivalence, CIF carry
equivalence, and end-to-end chunked decoding with a tiny model."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from funasr_tpu.frontends.streaming import StreamingFrontend
from funasr_tpu.models.paraformer.model import Paraformer
from funasr_tpu.models.paraformer_streaming import functional as SF
from funasr_tpu.models.paraformer_streaming.model import ParaformerStreaming
from funasr_tpu.ops import fbank as F
from funasr_tpu.ops.cif import cif


def test_streaming_frontend_matches_offline(rng):
    wav = rng.standard_normal(16000 * 2).astype(np.float32) * 0.1
    # offline
    feats, flens = F.fbank(jnp.asarray(wav[None]), jnp.asarray([len(wav)]),
                           dither=0.0)
    off, off_lens = F.apply_lfr(feats, flens, 7, 6)
    off = np.asarray(off[0, : int(off_lens[0])])
    # streaming: 600 ms chunks
    fe = StreamingFrontend(lfr_m=7, lfr_n=6)
    st = fe.init_state()
    outs = []
    stride = 9600
    n = (len(wav) + stride - 1) // stride
    for i in range(n):
        o, st = fe.step(st, wav[i * stride:(i + 1) * stride],
                        is_final=(i == n - 1))
        if len(o):
            outs.append(o)
    stream = np.concatenate(outs, axis=0)
    assert stream.shape[0] == off.shape[0]
    np.testing.assert_allclose(stream, off, rtol=1e-4, atol=1e-4)


def test_cif_chunk_carry_equivalence(rng):
    """Chunked CIF with carried integrate state == offline CIF."""
    B, T, D = 1, 40, 8
    alphas = rng.uniform(0.05, 0.5, (B, T)).astype(np.float32)
    hidden = rng.standard_normal((B, T, D)).astype(np.float32)
    off = cif(jnp.asarray(hidden), jnp.asarray(alphas), 32)
    off_embeds = np.asarray(off.embeds)
    total = int(np.floor(alphas.sum()))

    state = SF.init_cif_state(B, D)
    got = []
    for i in range(0, T, 10):
        e, n, state = SF.cif_chunk(
            jnp.asarray(hidden[:, i:i + 10]), jnp.asarray(alphas[:, i:i + 10]),
            state, 8,
        )
        got.append(np.asarray(e[0, : int(n[0])]))
    stream_embeds = np.concatenate(got, axis=0)
    assert stream_embeds.shape[0] == total
    np.testing.assert_allclose(stream_embeds, off_embeds[0, :total],
                               rtol=1e-4, atol=1e-4)


TINY = dict(
    vocab_size=32,
    input_size=24,
    encoder_conf=dict(output_size=16, attention_heads=2, linear_units=32,
                      num_blocks=3, kernel_size=5, dropout_rate=0.0),
    decoder_conf=dict(attention_heads=2, linear_units=32, num_blocks=2,
                      att_layer_num=2, kernel_size=5, dropout_rate=0.0),
    predictor_conf=dict(idim=16, tail_threshold=0.45, dropout=0.0),
)


@pytest.fixture(scope="module")
def tiny_params():
    model = Paraformer(**TINY)
    key = jax.random.PRNGKey(0)
    T = 30
    speech = jax.random.normal(key, (1, T, 24))
    params = model.init({"params": key}, speech, jnp.array([T]),
                        max_tokens=16, method=model.greedy_decode)
    return params


def test_streaming_end_to_end(tiny_params, rng):
    fe = StreamingFrontend(n_mels=8, lfr_m=3, lfr_n=2)
    sm = ParaformerStreaming(
        tiny_params, input_size=24, d_model=16, n_head=2,
        enc_kernel=5, dec_kernel=5, n_enc_layers=3, n_dec_layers=2,
        chunk_size=(0, 6, 3), encoder_chunk_look_back=2, frontend=fe,
    )
    wav = rng.standard_normal(16000).astype(np.float32) * 0.1
    out = sm.inference(wav, chunk_ms=200)
    assert isinstance(out["token_ids"], list)
    # determinism: same audio -> same tokens
    out2 = sm.inference(wav, chunk_ms=200)
    assert out["token_ids"] == out2["token_ids"]
    # different chunking still yields similar token counts (not exact --
    # attention context differs)
    out3 = sm.inference(wav, chunk_ms=400)
    assert abs(len(out3["token_ids"]) - len(out["token_ids"])) <= 4


def test_streaming_emits_from_trained_region(tiny_params):
    """Silence in, few tokens out (alphas near sigmoid(b) untrained; just
    check the machinery is shape-stable across many chunks)."""
    fe = StreamingFrontend(n_mels=8, lfr_m=3, lfr_n=2)
    sm = ParaformerStreaming(
        tiny_params, input_size=24, d_model=16, n_head=2,
        enc_kernel=5, dec_kernel=5, n_enc_layers=3, n_dec_layers=2,
        chunk_size=(0, 6, 3), encoder_chunk_look_back=2, frontend=fe,
    )
    cache = sm.init_cache()
    total = []
    for i in range(5):
        toks = sm.generate_chunk(cache, np.zeros(3200, np.float32),
                                 is_final=(i == 4))
        total += toks
    assert cache.tokens == total

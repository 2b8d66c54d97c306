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


def test_decoder_fsmn_stream_matches_reference_torch(rng):
    """fsmn_stream == reference MultiHeadedAttentionSANMDecoder.forward with
    a carried cache (sanm/attention.py:499): symmetric first chunk, causal
    later chunks, the one-time right-pad gap, and no advance on empty
    chunks."""
    import sys
    sys.path.insert(0, "tests")
    import torch
    from reference_torch import load_reference

    att_mod = load_reference("funasr.models.sanm.attention")
    K, D, U = 5, 8, 6
    ref = att_mod.MultiHeadedAttentionSANMDecoder(D, 0.0, K).eval()
    kernel_t = torch.asarray(
        rng.standard_normal((D, 1, K)).astype(np.float32))
    with torch.no_grad():
        ref.fsmn_block.weight.copy_(kernel_t)
    # jax kernel layout (K, 1, D)
    kernel_j = jnp.asarray(np.transpose(np.asarray(kernel_t), (2, 1, 0)))

    chunks = [3, 0, 2, 4]  # token counts per chunk (incl. an empty chunk)
    cache_t = None
    cache_j = jnp.zeros((1, K - 1, D), jnp.float32)
    started = jnp.zeros((1,), jnp.bool_)
    for n in chunks:
        x = rng.standard_normal((1, max(n, 1), D)).astype(np.float32)
        if n > 0:
            with torch.no_grad():
                out_t, cache_t = ref(torch.asarray(x[:, :n]), None, cache_t)
        # padded grid on the jax side
        grid = np.zeros((1, U, D), np.float32)
        grid[:, :n] = x[:, :n] if n else 0.0
        mem, cache_j = SF.fsmn_stream(
            jnp.asarray(grid), jnp.asarray([n], jnp.int32), kernel_j,
            cache_j, started, kernel_size=K)
        started = started | (jnp.asarray([n]) > 0)
        if n > 0:
            np.testing.assert_allclose(
                np.asarray(mem[0, :n]), out_t.numpy()[0], rtol=2e-5,
                atol=2e-5)
    # caches agree at the end (reference cache holds the last K-1+t
    # entries; ours the last K-1 of the same stream)
    ref_tail = cache_t.numpy()[0].T[-(K - 1):]
    np.testing.assert_allclose(np.asarray(cache_j[0]), ref_tail,
                               rtol=2e-5, atol=2e-5)


def test_cif_final_chunk_reference_semantics(tiny_params, rng):
    """Final-chunk CIF must keep lookahead alphas and fire the tail with a
    ZERO pseudo-hidden (reference cif_predictor.py:277-289): total fired
    tokens equal the reference integrate-and-fire loop's count."""
    import flax

    # rig the predictor to a constant alpha for every frame: conv weights 0,
    # output kernel 0, output bias = logit(alpha)
    alpha = 0.45
    params = flax.core.unfreeze(jax.tree_util.tree_map(np.asarray,
                                                       tiny_params))
    pred = params["params"]["predictor"]
    pred["cif_conv1d"] = np.zeros_like(pred["cif_conv1d"])
    pred["cif_conv1d_bias"] = np.ones_like(pred["cif_conv1d_bias"])
    pred["cif_output"]["kernel"] = np.zeros_like(pred["cif_output"]["kernel"])
    pred["cif_output"]["bias"] = np.full_like(
        pred["cif_output"]["bias"], np.log(alpha / (1 - alpha)))

    fe = StreamingFrontend(n_mels=8, lfr_m=3, lfr_n=2)
    sm = ParaformerStreaming(
        params, input_size=24, d_model=16, n_head=2,
        enc_kernel=5, dec_kernel=5, n_enc_layers=3, n_dec_layers=2,
        chunk_size=(0, 6, 3), encoder_chunk_look_back=2, frontend=fe,
    )
    wav = rng.standard_normal(16000).astype(np.float32) * 0.1

    # count the LFR frames the frontend emits for this audio
    st = fe.init_state()
    feats, _ = fe.step(st, wav, is_final=True)
    n_frames = len(feats)

    # reference oracle: integrate-and-fire at constant alpha over all
    # frames, then the 0.45 tail pseudo-frame (threshold 1.0).  The first
    # window's r zero-fill frames also fire (the reference computes alphas
    # over the whole window incl. the zero feats cache and only masks the
    # lookback, cif_predictor.py:277).
    integrate, fires = 0.0, 0
    for _ in range(n_frames + sm.chunk_size[2]):
        integrate += alpha
        if integrate >= 1.0:
            fires += 1
            integrate -= 1.0
    integrate += sm.tail_threshold  # zero-hidden tail frame
    if integrate >= 1.0:
        fires += 1

    out = sm.inference(wav, chunk_ms=200)
    # blank tokens are filtered from token_ids, so compare raw fire counts
    cache = sm.init_cache()
    total = 0
    stride = 3200
    n = (len(wav) + stride - 1) // stride
    for i in range(n):
        part = wav[i * stride:(i + 1) * stride]
        l_, c_, r_ = sm.chunk_size
        feats_i, cache.frontend = sm.frontend.step(
            cache.frontend, part, is_final=(i == n - 1))
        if len(feats_i):
            cache.pending = np.concatenate([cache.pending, feats_i], axis=0)
        while len(cache.pending) >= c_:
            chunk, cache.pending = cache.pending[:c_], cache.pending[c_:]
            _, n_tok, cache.device = sm._step(
                sm.params, jnp.asarray(
                    np.concatenate([cache.feats_cache, chunk], 0)[None]),
                cache.device, jnp.asarray(0.0, jnp.float32),
                jnp.asarray(sm.window, jnp.int32))
            cache.feats_cache = np.concatenate(
                [cache.feats_cache, chunk], 0)[-(l_ + r_):]
            total += int(n_tok[0])
        if i == n - 1:
            n_real = len(cache.pending)
            pad = np.zeros((c_ - n_real, sm.input_size), np.float32)
            chunk = np.concatenate([cache.pending, pad], axis=0)
            _, n_tok, cache.device = sm._step(
                sm.params, jnp.asarray(
                    np.concatenate([cache.feats_cache, chunk], 0)[None]),
                cache.device, jnp.asarray(sm.tail_threshold, jnp.float32),
                jnp.asarray(l_ + r_ + n_real, jnp.int32))
            total += int(n_tok[0])
    assert total == fires

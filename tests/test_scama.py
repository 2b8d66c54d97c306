"""SCAMA chunk-aware decoder: torch logit parity, cached-step equivalence,
and the chunk-aware attention property (VERDICT r3 item 3)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

import sys, os  # noqa: E402
sys.path.insert(0, os.path.dirname(__file__))
from reference_torch import load_reference  # noqa: E402

from funasr_tpu.convert import _sanm_decoder_tree  # noqa: E402
from funasr_tpu.models.scama.decoder import (  # noqa: E402
    CachedScamaDecoder,
    FsmnDecoderSCAMAOpt,
    scama_cross_mask,
)

V, D, T, U = 24, 16, 24, 6
DEC = dict(attention_heads=2, linear_units=32, num_blocks=3,
           att_layer_num=2, kernel_size=5, dropout_rate=0.0,
           self_attention_dropout_rate=0.0, src_attention_dropout_rate=0.0)


@pytest.fixture(scope="module")
def ref_decoder():
    m = load_reference("funasr.models.scama.decoder")
    torch.manual_seed(0)
    dec = m.FsmnDecoderSCAMAOpt(vocab_size=V, encoder_output_size=D, **DEC)
    dec.eval()
    return dec


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(3)
    memory = rng.standard_normal((2, T, D)).astype(np.float32)
    mlens = np.array([T, T - 6], np.int32)
    ys_in = rng.integers(1, V, (2, U)).astype(np.int64)
    ylens = np.array([U, U - 2], np.int32)
    peaks = (rng.random((2, T)) < 0.25).astype(np.float32)
    mask = np.asarray(scama_cross_mask(
        jnp.asarray(peaks), jnp.asarray(mlens), jnp.asarray(ylens), U,
        chunk=4, look_back=1, n_frames=T))
    return memory, mlens, ys_in, ylens, mask, peaks


@pytest.fixture(scope="module")
def jax_decoder(ref_decoder):
    sd = {"decoder." + k: v.detach().numpy()
          for k, v in ref_decoder.state_dict().items()}
    params = _sanm_decoder_tree(sd, "decoder")
    dec = FsmnDecoderSCAMAOpt(vocab_size=V, encoder_output_size=D, **DEC)
    return dec, {"params": params}


def test_scama_decoder_torch_parity(ref_decoder, jax_decoder, data):
    """Teacher-forced logits == reference FsmnDecoderSCAMAOpt.forward
    (scama/decoder.py:353) with the same chunk mask, via the converter."""
    memory, mlens, ys_in, ylens, mask, _peaks = data
    with torch.no_grad():
        ref_out, _ = ref_decoder(
            torch.from_numpy(memory), torch.from_numpy(mlens.astype(np.int64)),
            torch.from_numpy(ys_in), torch.from_numpy(ylens.astype(np.int64)),
            chunk_mask=torch.from_numpy(mask))
    dec, params = jax_decoder
    got = dec.apply(params, jnp.asarray(memory), jnp.asarray(mlens),
                    jnp.asarray(ys_in.astype(np.int32)), jnp.asarray(ylens),
                    chunk_mask=jnp.asarray(mask))
    got = np.asarray(got)
    for b, n in enumerate(ylens):
        np.testing.assert_allclose(got[b, :n], ref_out.numpy()[b, :n],
                                   rtol=2e-4, atol=2e-4)


def test_scama_cached_step_equivalence(jax_decoder, data):
    """The FSMN-cache step scorer reproduces the teacher-forced per-token
    log-probs exactly (reference forward vs forward_one_step semantics,
    scama/decoder.py:430)."""
    memory, mlens, ys_in, ylens, mask, _peaks = data
    dec, params = jax_decoder
    full = dec.apply(params, jnp.asarray(memory), jnp.asarray(mlens),
                     jnp.asarray(ys_in.astype(np.int32)),
                     jnp.asarray(np.array([U, U], np.int32)),
                     chunk_mask=jnp.asarray(mask))
    full_logp = np.asarray(jax.nn.log_softmax(
        np.asarray(full).astype(np.float32), axis=-1))

    scorer = CachedScamaDecoder(
        params["params"], jnp.asarray(memory), jnp.asarray(mlens),
        n_head=DEC["attention_heads"], kernel_size=DEC["kernel_size"],
        cross_mask=jnp.asarray(mask), beam=1)
    state = scorer.init_state()
    for i in range(U):
        logp, state = scorer.step(jnp.asarray(ys_in[:, i].astype(np.int32)),
                                  jnp.asarray(i), state)
        np.testing.assert_allclose(np.asarray(logp), full_logp[:, i],
                                   rtol=1e-4, atol=1e-4)


def test_scama_chunk_aware_property(jax_decoder, data):
    """Chunk-awareness: perturbing encoder frames OUTSIDE token 0's
    attention window must not change token 0's logits (the streaming
    guarantee the mask encodes)."""
    memory, mlens, ys_in, ylens, mask, _peaks = data
    dec, params = jax_decoder
    args = (jnp.asarray(ys_in.astype(np.int32)), jnp.asarray(ylens))
    base = np.asarray(dec.apply(params, jnp.asarray(memory),
                                jnp.asarray(mlens), *args,
                                chunk_mask=jnp.asarray(mask)))
    allowed0 = mask[:, 0, :]  # (B, T)
    rng = np.random.default_rng(11)
    mem2 = memory + (1.0 - allowed0[:, :, None]) * \
        rng.standard_normal(memory.shape).astype(np.float32)
    pert = np.asarray(dec.apply(params, jnp.asarray(mem2),
                                jnp.asarray(mlens), *args,
                                chunk_mask=jnp.asarray(mask)))
    np.testing.assert_allclose(pert[:, 0], base[:, 0], rtol=1e-5, atol=1e-5)
    # and a frame INSIDE the window must change them
    mem3 = memory + allowed0[:, :, None] * 0.5
    pert3 = np.asarray(dec.apply(params, jnp.asarray(mem3),
                                 jnp.asarray(mlens), *args,
                                 chunk_mask=jnp.asarray(mask)))
    assert np.abs(pert3[:, 0] - base[:, 0]).max() > 1e-3


def test_scama_mask_semantics_vs_reference_builder(data):
    """scama_cross_mask == the reference chunk_utilis.py:370 mask builder
    under the training parameterisation (per-frame alignments,
    chunk_size=1, attention_chunk_size=encoder_chunk_size, no hopping)."""
    memory, mlens, ys_in, ylens, mask, _peaks = data
    cu = load_reference("funasr.models.scama.chunk_utilis")
    peaks = _peaks
    ref = cu.build_scama_mask_for_cross_attention_decoder(
        predictor_alignments=torch.from_numpy(peaks.astype(np.int64)),
        encoder_sequence_length=torch.from_numpy(mlens.astype(np.int64)),
        chunk_size=1, encoder_chunk_size=4,
        attention_chunk_center_bias=0, attention_chunk_size=4,
        attention_chunk_type="chunk", step=None,
        predictor_mask_chunk_hopping=None, decoder_att_look_back_factor=1,
        mask_shift_att_chunk_decoder=None,
        target_length=torch.from_numpy(ylens.astype(np.int64)),
        is_training=True)
    got = np.asarray(scama_cross_mask(
        jnp.asarray(peaks), jnp.asarray(mlens), jnp.asarray(ylens),
        int(ref.shape[1]), chunk=4, look_back=1, n_frames=T))
    np.testing.assert_array_equal(got[:, :ref.shape[1], :ref.shape[2]],
                                  ref.numpy())


def test_scama_streaming_reveal_equivalence(jax_decoder, data):
    """The streaming contract: scoring step i with ONLY the revealed
    encoder frames (memory truncated to token i's window end) equals
    scoring with full memory under the chunk mask with unlimited
    look-back — i.e. chunk-synchronised decoding never needs frames that
    have not arrived yet (reference generate_chunk semantics,
    scama/model.py:520)."""
    memory, mlens, ys_in, ylens, mask, peaks = data
    dec, params = jax_decoder
    b = 0
    mem1 = memory[b:b + 1]
    peaks1 = jnp.asarray(peaks[b:b + 1])
    chunk, U_dec = 4, 4

    full_mask = scama_cross_mask(
        peaks1, jnp.asarray([T]), jnp.asarray([U_dec]), U_dec,
        chunk=chunk, look_back=-1, n_frames=T)
    scorer_full = CachedScamaDecoder(
        params["params"], jnp.asarray(mem1), jnp.asarray([T]),
        n_head=DEC["attention_heads"], kernel_size=DEC["kernel_size"],
        cross_mask=full_mask, beam=1)
    state_f = scorer_full.init_state()

    # per-token window ends from the fire alignment (same math as the
    # mask builder)
    cum = np.cumsum(np.asarray(peaks1)[0])
    ends = []
    for i in range(U_dec):
        ff = int(np.sum(cum < i + 1))
        ff = min(ff, T - 1)
        ends.append(min(T, (ff // chunk + 1) * chunk))

    # streaming: rebuild the scorer per step over the REVEALED prefix
    # only (no mask), reusing the FSMN state
    state_s = None
    tok = jnp.asarray(np.asarray(ys_in)[b:b + 1, 0].astype(np.int32))
    for i in range(U_dec):
        revealed = np.zeros_like(np.asarray(mem1))
        revealed[:, :ends[i]] = np.asarray(mem1)[:, :ends[i]]
        scorer_i = CachedScamaDecoder(
            params["params"], jnp.asarray(revealed),
            jnp.asarray([ends[i]]),
            n_head=DEC["attention_heads"], kernel_size=DEC["kernel_size"],
            beam=1)
        if state_s is None:
            state_s = scorer_i.init_state()
        tok_i = jnp.asarray(np.asarray(ys_in)[b:b + 1, i].astype(np.int32))
        lp_s, state_s = scorer_i.step(tok_i, jnp.asarray(i), state_s)
        lp_f, state_f = scorer_full.step(tok_i, jnp.asarray(i), state_f)
        np.testing.assert_allclose(np.asarray(lp_s), np.asarray(lp_f),
                                   rtol=1e-5, atol=1e-5)

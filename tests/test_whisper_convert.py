"""openai-whisper ``.pt`` checkpoint converter parity.

The reference loads Whisper through the openai-whisper package
(reference funasr/models/whisper_lid/model.py builds from its checkpoints);
convert.whisper_from_openai_pt maps that layout onto our HF-flax graph.
Here a tiny HF torch WhisperForConditionalGeneration provides ground
truth: its state_dict is renamed INTO the openai layout, saved as a real
``.pt`` with a ``dims`` header, converted back by our function, and the
flax logits must match the torch logits.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

DIMS = dict(n_mels=8, n_audio_ctx=32, n_audio_state=16, n_audio_head=2,
            n_audio_layer=2, n_vocab=64, n_text_ctx=16, n_text_state=16,
            n_text_head=2, n_text_layer=2)

_HF_TO_OPENAI = (
    (".encoder_attn_layer_norm.", ".cross_attn_ln."),
    (".self_attn_layer_norm.", ".attn_ln."),
    (".encoder_attn.", ".cross_attn."),
    (".self_attn.", ".attn."),
    (".q_proj.", ".query."),
    (".k_proj.", ".key."),
    (".v_proj.", ".value."),
    (".out_proj.", ".out."),
    (".final_layer_norm.", ".mlp_ln."),
    (".fc1.", ".mlp.0."),
    (".fc2.", ".mlp.2."),
)


def _hf_key_to_openai(k: str):
    if k == "model.encoder.embed_positions.weight":
        return "encoder.positional_embedding"
    if k == "model.decoder.embed_positions.weight":
        return "decoder.positional_embedding"
    for pre, post in (("model.encoder.conv1.", "encoder.conv1."),
                      ("model.encoder.conv2.", "encoder.conv2."),
                      ("model.encoder.layer_norm.", "encoder.ln_post."),
                      ("model.encoder.layers.", "encoder.blocks."),
                      ("model.decoder.embed_tokens.",
                       "decoder.token_embedding."),
                      ("model.decoder.layer_norm.", "decoder.ln."),
                      ("model.decoder.layers.", "decoder.blocks.")):
        if k.startswith(pre):
            k = post + k[len(pre):]
            for a, b in _HF_TO_OPENAI:
                k = k.replace(a, b)
            return k
    return None  # proj_out (tied) and other non-openai keys


def _tiny_torch_model():
    from transformers import WhisperConfig, WhisperForConditionalGeneration

    cfg = WhisperConfig(
        vocab_size=DIMS["n_vocab"], num_mel_bins=DIMS["n_mels"],
        d_model=DIMS["n_audio_state"],
        encoder_layers=DIMS["n_audio_layer"],
        encoder_attention_heads=DIMS["n_audio_head"],
        decoder_layers=DIMS["n_text_layer"],
        decoder_attention_heads=DIMS["n_text_head"],
        encoder_ffn_dim=4 * DIMS["n_audio_state"],
        decoder_ffn_dim=4 * DIMS["n_audio_state"],
        max_source_positions=DIMS["n_audio_ctx"],
        max_target_positions=DIMS["n_text_ctx"],
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        decoder_start_token_id=3,
        suppress_tokens=[], begin_suppress_tokens=[],
    )
    torch.manual_seed(0)
    return WhisperForConditionalGeneration(cfg).eval()


def test_openai_pt_roundtrip_logit_parity(tmp_path):
    import jax.numpy as jnp

    from funasr_tpu.convert import whisper_from_openai_pt

    tm = _tiny_torch_model()
    openai_sd = {}
    for k, v in tm.state_dict().items():
        ok = _hf_key_to_openai(k)
        if ok is not None:
            openai_sd[ok] = v
    # openai checkpoints have no key-projection bias (attention.key has
    # bias=False); the HF model's k_proj bias is zero-init — drop it like
    # the real layout does and rely on HF re-zero-initializing it
    openai_sd = {k: v for k, v in openai_sd.items()
                 if not k.endswith("key.bias")}
    pt = tmp_path / "tiny_openai.pt"
    torch.save({"dims": dict(DIMS), "model_state_dict": openai_sd}, pt)

    config, params = whisper_from_openai_pt(str(pt))
    assert config.d_model == DIMS["n_audio_state"]
    assert config.encoder_layers == DIMS["n_audio_layer"]

    from transformers.models.whisper.modeling_flax_whisper import (
        FlaxWhisperForConditionalGeneration,
    )

    fm = FlaxWhisperForConditionalGeneration(config, dtype=jnp.float32,
                                             _do_init=False)
    rng = np.random.default_rng(0)
    feats = rng.standard_normal(
        (1, DIMS["n_mels"], 2 * DIMS["n_audio_ctx"])).astype(np.float32)
    dec_ids = np.array([[1, 5, 9, 3]], np.int64)

    with torch.no_grad():
        ref = tm(input_features=torch.from_numpy(feats),
                 decoder_input_ids=torch.from_numpy(dec_ids)).logits.numpy()
    got = np.asarray(fm(input_features=jnp.asarray(feats),
                        decoder_input_ids=jnp.asarray(dec_ids),
                        params=params).logits)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)


def test_whisper_wrap_loads_openai_pt(tmp_path):
    import jax.numpy as jnp

    from funasr_tpu.models.whisper.model import WhisperWrap

    tm = _tiny_torch_model()
    openai_sd = {}
    for k, v in tm.state_dict().items():
        ok = _hf_key_to_openai(k)
        if ok is not None and not ok.endswith("key.bias"):
            openai_sd[ok] = v
    pt = tmp_path / "tiny_openai.pt"
    torch.save({"dims": dict(DIMS), "model_state_dict": openai_sd}, pt)

    w = WhisperWrap(model_path=str(pt), dtype=jnp.float32)
    feats = jnp.zeros((1, DIMS["n_mels"], 2 * DIMS["n_audio_ctx"]),
                      jnp.float32)
    enc = w.encode(feats)
    assert enc.shape == (1, DIMS["n_audio_ctx"], DIMS["n_audio_state"])
    toks = w.greedy_decode(feats, max_tokens=3)
    assert np.asarray(toks).shape == (1, 3)


def test_multilingual_vocab_gets_multilingual_token_ids(tmp_path):
    """Multilingual openai vocabs put <|startoftranscript|> at 50258 /
    <|endoftext|> at 50257; HF's English-only defaults (50257/50256) would
    seed greedy decode from <|endoftext|> on converted v2/v3 checkpoints."""
    from funasr_tpu.convert import whisper_from_openai_pt

    dims = dict(DIMS, n_vocab=51865)
    tm = _tiny_torch_model()  # weights don't matter for the config check
    sd = {}
    for k, v in tm.state_dict().items():
        ok = _hf_key_to_openai(k)
        if ok is not None and not ok.endswith("key.bias"):
            sd[ok] = v
    # resize the vocab-sized tensors to the multilingual vocab
    emb = torch.zeros(51865, DIMS["n_text_state"])
    emb[: DIMS["n_vocab"]] = sd["decoder.token_embedding.weight"]
    sd["decoder.token_embedding.weight"] = emb
    pt = tmp_path / "multi.pt"
    torch.save({"dims": dims, "model_state_dict": sd}, pt)

    config, _ = whisper_from_openai_pt(str(pt))
    assert config.decoder_start_token_id == 50258
    assert config.eos_token_id == 50257

    # English-only layout keeps HF defaults
    pt2 = tmp_path / "tiny.pt"
    sd["decoder.token_embedding.weight"] = emb[: DIMS["n_vocab"]]
    torch.save({"dims": dict(DIMS), "model_state_dict": sd}, pt2)
    config2, _ = whisper_from_openai_pt(str(pt2))
    assert config2.decoder_start_token_id == 50257

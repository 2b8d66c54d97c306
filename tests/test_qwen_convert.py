"""Qwen2 LLM-half converter: logit parity vs HF transformers torch.

Closes the last family without a weight-loading path (reference builds
its LLM-ASR stacks from hub causal-LM checkpoints,
funasr/models/llm_asr/model.py:27) — qwen2_from_torch maps an HF
``Qwen2ForCausalLM`` state_dict onto models/llm_asr/qwen.py with exact
logits, and the LLMASR prefix-LM consumes the converted LLM half.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from funasr_tpu.convert import convert_from_torch, detect_arch, \
    qwen2_from_torch
from funasr_tpu.models.llm_asr.qwen import Qwen2LM

CFG = dict(vocab_size=96, hidden_size=64, num_hidden_layers=2,
           num_attention_heads=4, num_key_value_heads=2,
           intermediate_size=128, max_position_embeddings=128,
           rope_theta=10000.0, rms_norm_eps=1e-6,
           tie_word_embeddings=False)


def _torch_model():
    torch.manual_seed(0)
    cfg = transformers.Qwen2Config(**CFG)
    return transformers.Qwen2ForCausalLM(cfg).eval()


def _flax_model(tie=False):
    return Qwen2LM(vocab_size=CFG["vocab_size"], dim=CFG["hidden_size"],
                   layers=CFG["num_hidden_layers"],
                   heads=CFG["num_attention_heads"],
                   kv_heads=CFG["num_key_value_heads"],
                   ffn=CFG["intermediate_size"],
                   rope_theta=CFG["rope_theta"],
                   rms_eps=CFG["rms_norm_eps"],
                   tie_word_embeddings=tie)


def test_qwen2_logit_parity():
    tm = _torch_model()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    assert detect_arch(sd) == "qwen2"
    variables = convert_from_torch(sd)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, CFG["vocab_size"], size=(2, 11))
    with torch.no_grad():
        want = tm(torch.tensor(ids)).logits.numpy()

    fm = _flax_model()
    got = np.asarray(fm.apply(variables, jnp.asarray(ids, jnp.int32),
                              method=fm.logits_from_ids))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_qwen2_tied_embeddings_parity():
    torch.manual_seed(1)
    cfg = transformers.Qwen2Config(**{**CFG, "tie_word_embeddings": True})
    tm = transformers.Qwen2ForCausalLM(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = qwen2_from_torch(sd)
    assert "lm_head" not in variables["params"]

    rng = np.random.default_rng(1)
    ids = rng.integers(0, CFG["vocab_size"], size=(1, 9))
    with torch.no_grad():
        want = tm(torch.tensor(ids)).logits.numpy()
    fm = _flax_model(tie=True)
    got = np.asarray(fm.apply(variables, jnp.asarray(ids, jnp.int32),
                              method=fm.logits_from_ids))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_llm_asr_consumes_converted_qwen():
    """LLMASR(llm_conf type=qwen2): the converted LLM half slots into the
    prefix-LM param tree; loss + greedy decode run."""
    from funasr_tpu.models.llm_asr.model import LLMASR

    tm = _torch_model()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    llm_tree = qwen2_from_torch(sd)["params"]

    model = LLMASR(
        vocab_size=CFG["vocab_size"], input_size=20,
        encoder_conf=dict(output_size=16, attention_heads=2,
                          linear_units=32, num_blocks=2, kernel_size=5,
                          dropout_rate=0.0),
        adaptor_conf=dict(k=2),
        llm_conf=dict(type="qwen2", dim=CFG["hidden_size"],
                      layers=CFG["num_hidden_layers"],
                      heads=CFG["num_attention_heads"],
                      kv_heads=CFG["num_key_value_heads"],
                      ffn=CFG["intermediate_size"],
                      rope_theta=CFG["rope_theta"]))
    rng = np.random.default_rng(2)
    B, T, U = 2, 24, 5
    speech = jnp.asarray(rng.standard_normal((B, T, 20)), jnp.float32)
    slens = jnp.array([T, T - 5], jnp.int32)
    text = jnp.asarray(rng.integers(3, 90, (B, U)), jnp.int32)
    tlens = jnp.array([U, U - 2], jnp.int32)
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key},
                           speech, slens, text, tlens, deterministic=True)
    # splice the converted Qwen half in (tree must match exactly)
    assert set(llm_tree) == set(variables["params"]["llm"])
    params = dict(variables["params"])
    params["llm"] = jax.tree_util.tree_map(jnp.asarray, llm_tree)
    variables = {"params": params}
    loss, stats = model.apply(variables, speech, slens, text, tlens,
                              deterministic=True)
    assert np.isfinite(float(loss))
    toks, lens = model.apply(variables, speech, slens, maxlen=6,
                             method=model.greedy_decode)
    assert toks.shape == (B, 6) and lens.shape == (B,)

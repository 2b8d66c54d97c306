"""LoRA adapters: identity init, trainable mask, merge."""

import numpy as np
import jax
import jax.numpy as jnp

from funasr_tpu.models.lora import LoRADense, lora_trainable_mask, merge_lora


def test_lora_starts_as_identity(rng):
    m = LoRADense(features=6, r=4)
    x = jnp.asarray(rng.standard_normal((3, 5)), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)
    base = LoRADense(features=6, r=0)
    # same kernel/bias, no adapter -> identical outputs (B init = 0)
    p0 = {"params": {"kernel": params["params"]["kernel"],
                     "bias": params["params"]["bias"]}}
    np.testing.assert_allclose(np.asarray(m.apply(params, x)),
                               np.asarray(base.apply(p0, x)), rtol=1e-6)


def test_trainable_mask_selects_lora_only(rng):
    m = LoRADense(features=6, r=4)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 5)))
    mask = lora_trainable_mask(params)
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    for path, v in flat:
        keys = [getattr(k, "key", str(k)) for k in path]
        assert v == ("lora_A" in keys or "lora_B" in keys)


def test_merge_lora_matches_adapter_output(rng):
    m = LoRADense(features=6, r=4, alpha=16.0)
    x = jnp.asarray(rng.standard_normal((3, 5)), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)
    # give B real values so the adapter is active
    p = jax.tree_util.tree_map(lambda v: v, params)
    p["params"]["lora_B"] = jnp.asarray(
        rng.standard_normal((4, 6)) * 0.1, jnp.float32)
    full = m.apply(p, x)
    merged = merge_lora(p["params"])
    base = LoRADense(features=6, r=0)
    out = base.apply({"params": {"kernel": merged["kernel"],
                                 "bias": merged["bias"]}}, x)
    np.testing.assert_allclose(np.asarray(full), np.asarray(out), rtol=1e-5,
                               atol=1e-6)

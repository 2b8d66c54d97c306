"""Pipeline parallelism on the REAL flagship encoder stack.

Certifies that ``pp.enable`` routes ``SANMEncoder``'s scanned
``EncoderLayerSANM`` stack through the GPipe schedule (layer axis sharded
over the mesh) with:

- identical parameter trees (same init, same checkpoints),
- exact forward equality vs the single-device ``nn.scan`` stack,
- exact gradient equality through the UNMODIFIED ``make_train_step``
  (GPipe microbatch backward == sequential backward),
- dp x pp composition (batch stays sharded over the data axis inside the
  pipeline).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from funasr_tpu.models.sanm import SANMEncoder
from funasr_tpu.parallel import pp
from funasr_tpu.parallel.mesh import make_mesh

ENC = dict(input_size=24, output_size=16, attention_heads=2,
           linear_units=32, num_blocks=9, kernel_size=5,
           dropout_rate=0.0, attention_dropout_rate=0.0)


def _data(rng, B=4, T=20, D=24):
    xs = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    lengths = jnp.array([T, T - 3, T - 7, T // 2][:B], jnp.int32)
    return xs, lengths


@pytest.mark.parametrize("num_blocks,mesh_shape", [
    (9, (1, 8)),   # 8 scanned layers over 8 stages
    (17, (1, 8)),  # 2 layers per stage
    (9, (2, 4)),   # dp x pp: batch sharded over data, layers over model
])
def test_pp_sanm_encoder_forward_exact(num_blocks, mesh_shape):
    rng = np.random.default_rng(0)
    xs, lengths = _data(rng)
    enc = SANMEncoder(**{**ENC, "num_blocks": num_blocks})
    variables = enc.init({"params": jax.random.PRNGKey(0)}, xs, lengths)
    want, _ = enc.apply(variables, xs, lengths)

    mesh = make_mesh(data=mesh_shape[0], model=mesh_shape[1])
    with pp.pipelined(mesh, axis="model", n_micro=2, batch_axis="data"):
        # identical param tree: the pp branch declares via the holder
        v2 = enc.init({"params": jax.random.PRNGKey(0)}, xs, lengths)
        assert jax.tree_util.tree_structure(v2) \
            == jax.tree_util.tree_structure(variables)
        for a, b in zip(jax.tree_util.tree_leaves(v2),
                        jax.tree_util.tree_leaves(variables)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        got, _ = jax.jit(lambda v, x, l: enc.apply(v, x, l))(
            variables, xs, lengths)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_pp_train_step_grads_exact():
    """The unmodified make_train_step with pp enabled == single-device
    grads on the real flagship (tiny) Paraformer."""
    import optax

    from funasr_tpu.models.paraformer.model import Paraformer
    from funasr_tpu.train.train_step import (TrainState, create_train_state,
                                             make_train_step)

    model = Paraformer(
        vocab_size=64, input_size=24,
        encoder_conf=dict(output_size=16, attention_heads=2,
                          linear_units=32, num_blocks=9, kernel_size=5,
                          dropout_rate=0.0, attention_dropout_rate=0.0),
        decoder_conf=dict(attention_heads=2, linear_units=32, num_blocks=2,
                          att_layer_num=1, kernel_size=5, dropout_rate=0.0),
        predictor_conf=dict(idim=16, tail_threshold=0.45, dropout=0.0),
        # sampling_ratio=0: the GLM sampler's argmax-correctness mask is a
        # DISCRETE function of the encoder output and amplifies fp32
        # reassociation ULPs between the two XLA programs into sampled-
        # position flips; with it off the loss is smooth and the pp/non-pp
        # grads agree to fp tolerance.
        sampling_ratio=0.0,
    )
    B, T, U = 4, 20, 5
    rng = np.random.default_rng(1)
    batch = dict(
        speech=jnp.asarray(rng.standard_normal((B, T, 24)), jnp.float32),
        speech_lengths=jnp.array([T, T - 3, T - 7, T // 2], jnp.int32),
        text=jnp.asarray(rng.integers(3, 64, (B, U)), jnp.int32),
        text_lengths=jnp.array([U, U - 1, U - 2, 3], jnp.int32),
    )
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "dropout": key, "sampler": key},
                        batch["speech"], batch["speech_lengths"],
                        batch["text"], batch["text_lengths"])
    tx = optax.sgd(0.1)
    step_rng = jax.random.PRNGKey(7)

    state0 = create_train_state(params, tx)
    ref_step = make_train_step(model, tx)
    ref_state, ref_stats = ref_step(state0, batch, step_rng)

    mesh = make_mesh(data=2, model=4)
    with pp.pipelined(mesh, axis="model", n_micro=2, batch_axis="data"):
        pp_step = jax.jit(make_train_step(model, tx))
        pp_state, pp_stats = pp_step(state0, batch, step_rng)

    np.testing.assert_allclose(float(pp_stats["loss"]),
                               float(ref_stats["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(pp_stats["grad_norm"]),
                               float(ref_stats["grad_norm"]), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(pp_state.params),
                    jax.tree_util.tree_leaves(ref_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5, rtol=3e-5)


def test_pp_encoder_dropout_path_runs():
    """Non-deterministic pp stack with dropout>0: per-layer folded rngs,
    finite output, grads flow (stochastic — no parity claim)."""
    rng = np.random.default_rng(2)
    xs, lengths = _data(rng)
    enc = SANMEncoder(**{**ENC, "dropout_rate": 0.1})
    variables = enc.init({"params": jax.random.PRNGKey(0)}, xs, lengths)
    mesh = make_mesh(data=1, model=8)
    with pp.pipelined(mesh, axis="model", n_micro=2, batch_axis=None):
        def loss(v):
            y, _ = enc.apply(v, xs, lengths, deterministic=False,
                             rngs={"dropout": jax.random.PRNGKey(3)})
            return jnp.sum(y ** 2)

        val, grads = jax.value_and_grad(loss)(variables)
    assert np.isfinite(float(val))
    gn = float(jnp.sqrt(sum(jnp.sum(g ** 2)
                            for g in jax.tree_util.tree_leaves(grads))))
    assert np.isfinite(gn) and gn > 0

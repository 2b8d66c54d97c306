"""Device mesh + sharding rules.

The reference scales with DDP/FSDP/DeepSpeed over NCCL
(funasr/bin/train.py:69-146); the TPU-native equivalent is a
``jax.sharding.Mesh`` with a ``data`` axis (batch / DP) and a ``model`` axis
(tensor parallel for large encoders), pjit-partitioned params, and XLA
collectives over ICI.  Loss/grad averaging semantics (weighted by per-rank
batch weight, trainer.py:396-449) fall out of sharded-batch ``jnp.mean`` —
no hand-written all_reduce.

Parameter sharding is rule-based on the flax param path: FFN hidden dims and
attention head dims shard over ``model``; everything else replicates.  With
``model=1`` this degrades to pure DP; with ``data=1`` to pure TP.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a (data, model) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model != n:
        raise ValueError(f"data*model = {data}*{model} != {n} devices")
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


# (regex over 'path/to/param', partition spec for its dims), first match wins.
# Kernel layouts follow flax: Dense kernel (in, out); depthwise conv (K, 1, D);
# scanned stacks get a leading layer axis handled by _prepend_layer_axis.
_PARAM_RULES: Tuple[Tuple[str, P], ...] = (
    # FFN: hidden dim sharded
    (r".*feed_forward/w_1/kernel", P(None, "model")),
    (r".*feed_forward/w_1/bias", P("model")),
    (r".*feed_forward/w_2/kernel", P("model", None)),
    (r".*feed_forward/norm/(scale|bias)", P("model")),
    # fused attention projections: head dim sharded
    (r".*linear_q_k_v/kernel", P(None, "model")),
    (r".*linear_q_k_v/bias", P("model")),
    (r".*linear_k_v/kernel", P(None, "model")),
    (r".*linear_k_v/bias", P("model")),
    (r".*linear_q/kernel", P(None, "model")),
    (r".*linear_q/bias", P("model")),
    (r".*linear_out/kernel", P("model", None)),
    # HF-flax style (Whisper/Qwen-Audio) and in-house generic names
    (r".*(q_proj|k_proj|v_proj)/kernel", P(None, "model")),
    (r".*(q_proj|k_proj|v_proj)/bias", P("model")),
    (r".*out_proj/kernel", P("model", None)),
    (r".*fc1/kernel", P(None, "model")),
    (r".*fc1/bias", P("model")),
    (r".*fc2/kernel", P("model", None)),
    (r".*qkv/kernel", P(None, "model")),
    (r".*qkv/bias", P("model")),
    (r".*/out/kernel", P("model", None)),
    (r".*lm_head/kernel", P(None, "model")),
    # vocab projections: vocab dim sharded
    (r".*output_layer/kernel", P(None, "model")),
    (r".*output_layer/bias", P("model")),
    (r".*embed/embedding", P("model", None)),
    (r".*ctc_lo/kernel", P(None, "model")),
    (r".*ctc_lo/bias", P("model")),
)


def _spec_for(path: str, ndim: int) -> P:
    """Match a param path against the rules; scanned layer stacks carry one
    extra leading (layer) axis, which replicates."""
    for pat, spec in _PARAM_RULES:
        if re.fullmatch(pat, path):
            parts = list(spec)
            if ndim == len(parts) + 1:  # scanned stack: (L, ...)
                parts = [None] + parts
            while len(parts) < ndim:
                parts.append(None)
            return P(*parts[:ndim])
    return P()  # replicate


def param_shardings(params, mesh: Mesh, fsdp: bool = False,
                    fsdp_min_size: int = 2 ** 14):
    """Tree of NamedShardings for a flax param tree.

    ``fsdp=True`` is the reference's FSDP/ZeRO equivalent
    (funasr/bin/train.py:123-146 wraps in FullyShardedDataParallel with a
    min-1e5-param auto-wrap policy): every parameter additionally shards
    one free dim over the ``data`` axis, so each DP rank holds 1/data of
    the weights and XLA inserts the all-gather before use / reduce-scatter
    of grads — the ZeRO-3 dataflow, compiler-scheduled.  Small leaves
    (< ``fsdp_min_size`` elements, the auto-wrap analogue) stay replicated.
    """
    n_data = mesh.shape.get("data", 1)

    def assign(kp, leaf):
        path = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)
        spec = _spec_for(path, leaf.ndim)
        # a named axis only applies when the dim divides by it (tiny
        # vocab/test shapes would otherwise fail device_put); replicate
        # the non-divisible dims instead
        parts0 = list(spec) + [None] * (leaf.ndim - len(spec))
        for d, ax in enumerate(parts0):
            if ax is not None and leaf.shape[d] % mesh.shape.get(ax, 1):
                parts0[d] = None
        spec = P(*parts0) if parts0 else P()
        if fsdp and n_data > 1 and leaf.size >= fsdp_min_size:
            parts = list(spec) + [None] * (leaf.ndim - len(spec))
            # shard the largest data-divisible free dim over `data`
            free = [d for d in range(leaf.ndim)
                    if parts[d] is None and leaf.shape[d] % n_data == 0]
            if free:
                d = max(free, key=lambda i: leaf.shape[i])
                parts[d] = "data"
                spec = P(*parts)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(assign, params)


def init_sharded_opt_state(tx, params, mesh: Mesh):
    """``tx.init`` under jit inherits param shardings for the moment trees,
    but scalar leaves (e.g. adam's ``count``) can end up committed to a
    single device, which later fails jit's device-consistency check.  Pin
    every scalar leaf to a replicated sharding on the mesh."""
    opt_state = jax.jit(tx.init)(params)
    rep = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda l: jax.device_put(l, rep) if getattr(l, "ndim", None) == 0 else l,
        opt_state,
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch tensors shard their leading dim over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def dp_jit(fn, mesh: Mesh, n_batch_args: int, static_argnames=()):
    """Data-parallel inference jit (SURVEY §7.13: serving scales over the
    mesh the same way the reference scales GPU pipelines by process count).

    ``fn(params, *batch_args, ...)`` is jitted with the params pytree
    replicated and the next ``n_batch_args`` array arguments sharded on
    their leading (batch) axis over the ``data`` mesh axis; outputs shard
    the same way.  Callers pad the batch to a multiple of the data-axis
    size (see ``BatchedAsrEngine._pack``).
    """
    in_shardings = (replicated(mesh),) + (batch_sharding(mesh),) * n_batch_args
    return jax.jit(fn, static_argnames=static_argnames,
                   in_shardings=in_shardings)

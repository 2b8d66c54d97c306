"""Export servables (reference funasr/auto/auto_model.py:675 ``export`` and
funasr/bin/export.py:10 ``funasr-export``).

The reference exports ONNX/TorchScript graphs for its C++ runtime.  The
TPU-native equivalent is a **StableHLO servable**: the engine's jitted
decode function is ahead-of-time exported with ``jax.export`` at fixed
bucket shapes, serialized next to the weights, and reloadable in any
process (CPU or TPU) without the Python model code::

    artifacts/
      config.yaml        # copied model config (registry-name compatible)
      model.npz          # flat '/'-joined flax leaves (AutoModel loadable)
      servable_b{B}_s{S}.stablehlo   # per (batch, seconds) bucket
      export_meta.json   # bucket table + input/output signature

Loading: ``load_servable(path)`` returns a callable
``(params_leaves, wav, lens) -> (tokens, token_lengths)``.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import export as jax_export


def _flatten_params(params) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(
            p.key if hasattr(p, "key") else str(p.idx) for p in path
        )
        flat[key] = np.asarray(leaf)
    return flat


def _leaves(params) -> List[jnp.ndarray]:
    return jax.tree_util.tree_leaves(params)


def export_engine(
    engine,
    out_dir: str,
    batch_sizes: Sequence[int] = (1, 8),
    seconds: Sequence[int] = (15,),
    fs: int = 16000,
    platforms: Optional[Sequence[str]] = None,
    config: Optional[Dict[str, Any]] = None,
) -> Dict[str, Any]:
    """AOT-export an engine's decode function at fixed bucket shapes."""
    os.makedirs(out_dir, exist_ok=True)

    params = engine.params
    treedef = jax.tree_util.tree_structure(params)
    np.savez(os.path.join(out_dir, "model.npz"), **_flatten_params(params))
    if config:
        import yaml

        with open(os.path.join(out_dir, "config.yaml"), "w") as f:
            yaml.safe_dump(config, f, allow_unicode=True, sort_keys=False)

    meta: Dict[str, Any] = {"fs": fs, "buckets": [],
                            "engine": type(engine).__name__}
    for B in batch_sizes:
        for S in seconds:
            T = fs * S

            def fn(leaves, wav, lens):
                p = jax.tree_util.tree_unflatten(treedef, leaves)
                return engine.decode_fn(p, wav, lens)

            args = (
                _leaves(params),
                jnp.zeros((B, T), jnp.float32),
                jnp.zeros((B,), jnp.int32),
            )
            exp = jax_export.export(
                jax.jit(fn),
                platforms=list(platforms) if platforms else None,
            )(*args)
            name = f"servable_b{B}_s{S}.stablehlo"
            with open(os.path.join(out_dir, name), "wb") as f:
                f.write(exp.serialize())
            meta["buckets"].append(
                {"batch": B, "seconds": S, "file": name,
                 "platforms": list(exp.platforms)}
            )
    with open(os.path.join(out_dir, "export_meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    return meta


class LoadedServable:
    """A deserialized export bundle: picks the bucket for each request."""

    def __init__(self, out_dir: str):
        with open(os.path.join(out_dir, "export_meta.json")) as f:
            self.meta = json.load(f)
        self.fs = self.meta["fs"]
        data = dict(np.load(os.path.join(out_dir, "model.npz")))
        # rebuild the nested tree, then take tree_leaves: dict flattening
        # sorts keys per level, reproducing the original leaf order
        tree: Dict[str, Any] = {}
        for k, v in data.items():
            node = tree
            parts = k.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = jnp.asarray(v)
        self.param_leaves = jax.tree_util.tree_leaves(tree)
        self._fns: Dict[Tuple[int, int], Any] = {}
        self._dir = out_dir
        self.buckets = sorted(
            [(b["batch"], b["seconds"], b["file"])
             for b in self.meta["buckets"]]
        )

    def _fn(self, B: int, S: int, fname: str):
        if (B, S) not in self._fns:
            with open(os.path.join(self._dir, fname), "rb") as f:
                self._fns[(B, S)] = jax_export.deserialize(f.read())
        return self._fns[(B, S)]

    def _pick(self, n: int, samples: int) -> Tuple[int, int, str]:
        for B, S, fname in self.buckets:
            if B >= n and S * self.fs >= samples:
                return B, S, fname
        return self.buckets[-1]

    def __call__(self, wavs: Sequence[np.ndarray]):
        """Decode any number of waveforms: batches larger than the biggest
        bucket run in chunks (nothing is dropped); audio longer than the
        longest seconds bucket raises instead of silently truncating."""
        n = len(wavs)
        max_B = max(b for b, _, _ in self.buckets)
        if n > max_B:  # chunk and concatenate per-output
            outs = [self(wavs[i: i + max_B]) for i in range(0, n, max_B)]
            return tuple(np.concatenate([o[k] for o in outs], axis=0)
                         for k in range(len(outs[0])))
        samples = max(len(w) for w in wavs)
        max_T = max(s for _, s, _ in self.buckets) * self.fs
        if samples > max_T:
            raise ValueError(
                f"audio of {samples / self.fs:.1f}s exceeds the largest "
                f"exported bucket ({max_T / self.fs:.0f}s); re-export with "
                "a larger `seconds` bucket or segment with a VAD model")
        B, S, fname = self._pick(n, samples)
        T = S * self.fs
        wav = np.zeros((B, T), np.float32)
        lens = np.zeros((B,), np.int32)
        for i, w in enumerate(wavs):
            wav[i, : len(w)] = w
            lens[i] = len(w)
        out = self._fn(B, S, fname).call(self.param_leaves, wav, lens)
        return tuple(np.asarray(o)[:n] for o in out)


def load_servable(out_dir: str) -> LoadedServable:
    return LoadedServable(out_dir)

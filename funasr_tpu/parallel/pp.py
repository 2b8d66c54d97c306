"""Pipeline-parallel context: route scanned encoder stacks through GPipe.

Like ``ops.quant``, this is a module-level trace-time flag: enabling it
makes ``SANMEncoder`` (models/sanm.py) run its scanned layer stack through
``pipeline_apply`` (parallel/pipeline.py) with the LAYER axis sharded over
a mesh axis, instead of the on-device ``nn.scan``.  The parameter tree is
unchanged (the stacked holder declares the identical tree), so the same
checkpoints, converters, and the unmodified ``make_train_step`` all work —
enabling pp turns the standard dp(x tp) train step into a dp x pp one.

IMPORTANT (same trap as ``quant.enable``): the flag is read at TRACE time.
Toggling it does not retrace an existing ``jax.jit`` wrapper — construct
the jitted function after setting the context.

The reference has no pipeline analogue (DDP only, funasr/bin/train.py:69).
"""

from __future__ import annotations

import contextlib
from typing import Optional

from jax.sharding import Mesh

_STATE = {"mesh": None, "axis": "model", "n_micro": 1, "batch_axis": None}


def enable(mesh: Mesh, axis: str = "model", n_micro: int = 2,
           batch_axis: Optional[str] = "data") -> None:
    """Turn on pipeline routing for supporting encoders.

    ``axis``: mesh axis the LAYER dimension shards over; ``n_micro``:
    GPipe microbatches (must divide the batch); ``batch_axis``: mesh axis
    the batch stays sharded over inside the pipeline (None = replicated).
    """
    if batch_axis is not None and batch_axis not in mesh.shape:
        batch_axis = None
    _STATE.update(mesh=mesh, axis=axis, n_micro=n_micro,
                  batch_axis=batch_axis)


def disable() -> None:
    _STATE["mesh"] = None


def enabled() -> bool:
    return _STATE["mesh"] is not None


def config() -> dict:
    return dict(_STATE)


@contextlib.contextmanager
def pipelined(mesh: Mesh, axis: str = "model", n_micro: int = 2,
              batch_axis: Optional[str] = "data"):
    prev = dict(_STATE)
    enable(mesh, axis, n_micro, batch_axis)
    try:
        yield
    finally:
        _STATE.update(prev)

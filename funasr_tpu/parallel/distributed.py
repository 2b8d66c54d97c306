"""Multi-host initialization (the reference's torchrun/NCCL bootstrap,
funasr/bin/train.py:69-122, re-expressed for JAX).

On a TPU pod slice each host calls ``init_distributed()`` (coordinator
address from the environment or arguments); afterwards ``jax.devices()``
spans the whole slice and the (data, model) mesh in funasr_tpu.parallel.mesh
lays data-parallel replicas across hosts (DCN) and model shards within a
host's ICI domain by construction (devices enumerate ICI-major).
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when running multi-host.

    Arguments default to the standard env vars (JAX's own, or the
    torchrun-style MASTER_ADDR/WORLD_SIZE/RANK the reference uses).
    Returns True if distributed mode was initialized.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if coordinator_address is None and os.environ.get("MASTER_ADDR"):
        port = os.environ.get("MASTER_PORT", "1234")
        coordinator_address = f"{os.environ['MASTER_ADDR']}:{port}"
    if num_processes is None:
        num_processes = int(
            os.environ.get("JAX_NUM_PROCESSES",
                           os.environ.get("WORLD_SIZE", "1"))
        )
    if process_id is None:
        process_id = int(
            os.environ.get("JAX_PROCESS_ID", os.environ.get("RANK", "0"))
        )
    if num_processes <= 1 or coordinator_address is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def local_batch_slice(global_batch: int) -> slice:
    """This host's slice of a globally-sharded batch (per-host data loading:
    each host feeds only its addressable shard)."""
    n = jax.process_count()
    i = jax.process_index()
    per = global_batch // n
    return slice(i * per, (i + 1) * per)

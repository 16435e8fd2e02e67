"""Multi-host (multi-slice / DCN) initialization.

The reference imports torch.distributed/DDP but never uses them (dead code,
utils/my_trainer.py:12-13,27 — SURVEY §2.3). Here multi-host is the same
GSPMD program as single-host: call `init_distributed()` once per process,
build the mesh over `jax.devices()` (which then spans all hosts), and feed
per-host shards through `shard_batch` (it already routes through
jax.make_array_from_process_local_data when process_count > 1).

Gradient all-reduces ride ICI within a slice and DCN across slices — XLA
places the collectives; nothing else changes.
"""

from __future__ import annotations

import os
from typing import Optional


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-process JAX. No-ops on single-process runs.

    On Cloud TPU pods the arguments are auto-detected from the metadata
    server; set them explicitly (or via JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID) elsewhere.
    """
    import jax

    explicit = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if explicit is None and num_processes is None and not _on_tpu_pod():
        return  # single-process
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def _on_tpu_pod() -> bool:
    return any(k in os.environ for k in ("TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS")) and (
        os.environ.get("TPU_WORKER_HOSTNAMES", "localhost") not in ("", "localhost"))


def local_batch_slice(global_batch: int) -> slice:
    """The half-open index range of the global batch this host should feed."""
    import jax

    per = global_batch // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)

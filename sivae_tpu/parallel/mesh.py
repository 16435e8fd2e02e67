"""Device mesh + sharding helpers: the TPU-native replacement for the
reference's torch.nn.DataParallel (main_DataParallel.py:609, SURVEY §2.3).

Design: pure data parallelism via XLA GSPMD. The train step stays a plain
jitted function; we place the batch with NamedSharding(P("data")) and
replicate the train state. XLA partitions the program and inserts the
gradient all-reduces (psum) over ICI. BatchNorm statistics are computed over
the GLOBAL batch (XLA inserts the cross-replica mean) — stronger than the
reference's per-replica DataParallel BN; documented parity decision.

Multi-host: the same program works under jax.distributed.initialize with a
process-spanning mesh; `shard_batch` uses
jax.make_array_from_process_local_data so each host feeds only its shard.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Tuple[int, ...] = (-1,),
    axis_names: Tuple[str, ...] = ("data",),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a device mesh. shape=(-1,) uses all devices on one axis."""
    devices = list(devices) if devices is not None else jax.devices()
    n = len(devices)
    shape = tuple(shape)
    if shape.count(-1) == 1:
        known = int(np.prod([s for s in shape if s != -1])) if len(shape) > 1 else 1
        shape = tuple(n // known if s == -1 else s for s in shape)
    mesh_devices = np.asarray(devices[: int(np.prod(shape))]).reshape(shape)
    return Mesh(mesh_devices, axis_names)


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding for a batch array: leading dim split over the data axis."""
    return NamedSharding(mesh, P(axis))


def volume_sharding(mesh: Mesh, data_axis: str = "data",
                    spatial_axis: str = "spatial") -> NamedSharding:
    """Sharding for NDHWC volumes: batch over `data_axis`, depth over
    `spatial_axis`. XLA GSPMD inserts the halo exchanges the 3x3x3 convs
    need at shard boundaries — the TPU-native equivalent of context/sequence
    parallelism for this workload (SURVEY §5 'long-context' row): it is how
    "fullsize" (~5M voxel) volumes exceed a single chip's activation memory.
    """
    return NamedSharding(mesh, P(data_axis, spatial_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data",
                spatial_axis: Optional[str] = None) -> Any:
    """Place a host batch (numpy or jax array/pytree) sharded over `axis`
    (and, for >=4-d arrays when `spatial_axis` is given, depth over it).

    In multi-process mode each process passes its local shard and the global
    array is assembled across hosts.
    """

    def put(x):
        x = np.asarray(x)
        if spatial_axis is not None and x.ndim >= 4:
            sharding = volume_sharding(mesh, axis, spatial_axis)
        else:
            sharding = data_sharding(mesh, axis)
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(sharding, x)
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


def _assert_identical_across_processes(state: Any) -> None:
    """Guard for multi-process replication: every process must hold
    bit-identical values before they are assembled into one replicated
    global array (the reference's DDP path would broadcast from rank 0;
    we verify instead of silently trusting same-seed construction —
    a checkpoint restored on one host only, or nondeterministic init,
    would otherwise produce inconsistent replicas with no error)."""
    import hashlib

    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    h = hashlib.sha256()
    for leaf in jax.tree_util.tree_leaves(state):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jax.dtypes.extended):
            leaf = jax.random.key_data(leaf)
        h.update(np.ascontiguousarray(np.asarray(leaf)).tobytes())
    # uint32 words: process_allgather round-trips through jnp, which under
    # the default x64-disabled config silently truncates uint64 to uint32 —
    # a uint64 digest would then never compare equal to its own gather
    digest = np.frombuffer(h.digest()[:16], dtype=np.uint32)
    gathered = np.asarray(
        multihost_utils.process_allgather(digest)).reshape(-1, digest.size)
    if not (gathered == digest).all():
        raise ValueError(
            "replicate_state: train-state checksums differ across processes "
            f"({gathered.tolist()}); every process must construct or "
            "restore the identical state before replication")


def replicate_state(state: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (train state) across the mesh.

    In multi-process mode the mesh spans non-addressable devices, where
    device_put is rejected; every process holds the identical full value
    (same seed — verified by a cross-process checksum), so the replicated
    global array is assembled from the process-local copy instead.
    """
    sharding = replicated(mesh)
    if jax.process_count() > 1:
        import jax.numpy as jnp

        _assert_identical_across_processes(state)

        def put(x):
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jax.dtypes.extended):
                # typed PRNG keys: assemble the raw uint32 key data globally,
                # then re-wrap (extended dtypes aren't numpy-representable)
                kd = np.asarray(jax.random.key_data(x))
                arr = jax.make_array_from_process_local_data(sharding, kd)
                return jax.random.wrap_key_data(
                    arr, impl=jax.random.key_impl(x))
            return jax.make_array_from_process_local_data(sharding, np.asarray(x))
    else:
        def put(x):
            return jax.device_put(x, sharding)
    return jax.tree_util.tree_map(put, state)

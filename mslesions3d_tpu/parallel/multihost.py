"""Multi-host (multi-process) training utilities: DCN + ICI meshes.

The reference is strictly single-GPU (pl.Trainer(devices=1), reference
train.py:182) and has no distributed-communication backend at all (SURVEY.md
§2). The TPU-native scale-out story has two tiers:

* **intra-slice (ICI)**: one process sees all chips of its slice;
  parallel.make_mesh / make_mesh_2d / make_mesh_3d over `jax.devices()`
  already span them — XLA emits psum/all_gather over ICI from shardings.
* **cross-slice / multi-host (DCN)**: one process per host, each attached to
  its local chips. After :func:`initialize_multihost`, `jax.devices()`
  returns the GLOBAL device list and the same global-view jit programs span
  hosts; XLA routes the inter-slice collectives over DCN. The mesh layout
  rule (scaling-book recipe): put the axis with the highest communication
  volume (here "data" — one gradient all-reduce per step, tiny params) on
  DCN and keep tensor/spatial axes inside a slice on ICI —
  :func:`dcn_friendly_mesh` encodes that.

Per-process data: each process should feed only its addressable shard;
:func:`process_batch_slice` maps a global batch index range onto this
process. With the device-resident dataset (train/loop.py) every process
materializes its own subject shard — the host<->device path never crosses
hosts.

No real multi-host fabric exists in CI; these helpers are exercised
single-process (n_processes=1 degenerates to the local path) and the mesh
math is tested on the virtual 8-device CPU mesh.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_multihost(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> bool:
    """Initialize jax.distributed when running multi-process; no-op otherwise.

    On TPU pods with standard env (TPU_WORKER_HOSTNAMES etc.) bare
    ``jax.distributed.initialize()`` autodetects everything; explicit args
    cover manual DCN setups. Returns True when a multi-process runtime is
    active after the call.
    """
    # IMPORTANT: do not touch jax.process_count()/jax.devices() before
    # deciding — they initialize the XLA backend, after which
    # jax.distributed.initialize() unconditionally raises (round-2 advisor
    # finding). Detect an already-initialized runtime from the client state
    # and multi-process INTENT from the explicit args / standard TPU env.
    from jax._src import distributed as _dist

    if _dist.global_state.client is not None:
        return jax.process_count() > 1  # already initialized
    import os

    # TPU_WORKER_HOSTNAMES counts only with >1 hosts: single-worker setups
    # (e.g. the axon tunnel exports "localhost") are not multi-process.
    workers = [h for h in os.environ.get("TPU_WORKER_HOSTNAMES", "").split(",") if h]
    intent = (
        coordinator_address is not None
        or (num_processes is not None and num_processes > 1)
        or len(workers) > 1
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
        or os.environ.get("COORDINATOR_ADDRESS")
    )
    if not intent:
        return False  # single process: nothing to do
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count() > 1


def dcn_friendly_mesh(data_per_slice: int | None = None,
                      axis_names=("data", "model")) -> Mesh:
    """Mesh whose OUTER (first) axis crosses slices/hosts over DCN.

    Device order from jax.devices() groups by process; reshaping
    (n_processes, devices_per_process) and splitting the per-process block
    into (data_local, model) puts the model/spatial axis strictly inside a
    process's chips (ICI) while the data axis spans processes (DCN) — data-
    parallel gradient all-reduce is the only traffic that crosses hosts.

    Single-process: degenerates to a (data, model) factorization of the
    local chips.
    """
    devices = np.asarray(jax.devices())
    n_proc = jax.process_count()
    per_proc = len(devices) // n_proc
    if data_per_slice is None:
        model = 1
        data_local = per_proc
    else:
        if per_proc % data_per_slice:
            raise ValueError(
                f"data_per_slice={data_per_slice} does not divide the "
                f"{per_proc} devices per process; choose a divisor of "
                f"{per_proc} (got {n_proc} processes x {per_proc} devices)"
            )
        model = per_proc // data_per_slice
        data_local = data_per_slice
    assert data_local * model == per_proc
    grid = devices.reshape(n_proc * data_local, model)
    return Mesh(grid, axis_names)


def process_batch_slice(global_batch: int) -> slice:
    """This process's contiguous slice of a global batch (data-parallel).

    Global batch B split evenly over processes; process i feeds rows
    [i*B/P, (i+1)*B/P). Ragged B raises — global batches must divide the
    process count, mirroring the device-count check in the Trainer.
    """
    p = jax.process_count()
    if global_batch % p:
        raise ValueError(
            f"global batch {global_batch} not divisible by process count {p}"
        )
    local = global_batch // p
    i = jax.process_index()
    return slice(i * local, (i + 1) * local)


def make_global(tree, mesh: Mesh, spec) -> object:
    """Pytree of process-local numpy arrays -> global jax.Arrays.

    ``spec`` is a PartitionSpec applied to every leaf. For a replicated spec
    (P()) every process passes the SAME full value; for a batch spec
    (P("data")) each process passes its :func:`process_batch_slice` rows.
    Single-process this is equivalent to a device_put with the sharding.
    """
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, spec)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        ),
        tree,
    )


def shard_global_batch(batch: dict, mesh: Mesh, axis_name: str = "data") -> dict:
    """Multi-process-safe version of parallel.shard_batch: each process
    contributes its :func:`process_batch_slice` rows of the GLOBAL batch
    dict (array leaves only; id lists pass through)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis_name))
    out = {}
    sl = None
    for k, v in batch.items():
        if isinstance(v, np.ndarray):
            if sl is None:
                sl = process_batch_slice(v.shape[0])
            out[k] = jax.make_array_from_process_local_data(
                sharding, np.ascontiguousarray(v[sl]), v.shape
            )
        else:
            out[k] = v
    return out

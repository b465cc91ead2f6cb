"""Device-mesh utilities for data-parallel training (jit + NamedSharding).

TPU-native parallelism design (replaces "nothing": the reference is strictly
single-GPU, pl.Trainer(devices=1), lesions3d/train.py:182; SURVEY.md §2):

* 1-D mesh over the batch axis ("data"): batches are sharded across chips,
  parameters/optimizer state are replicated. The train step is a single
  global-view jit program — XLA inserts the gradient all-reduce (psum over
  ICI) automatically from the output shardings.
* BatchNorm statistics are computed on the global batch inside the same jit
  program, i.e. synchronized BN across shards for free.
* Multi-host: call jax.distributed.initialize() before make_mesh and the
  same code spans hosts over DCN (mesh uses jax.devices() globally).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis_name: str = "data") -> dict:
    """Device-put array leaves of a batch dict with batch-axis sharding.

    Non-array entries (subject id lists) pass through untouched.
    """
    sharding = batch_sharding(mesh, axis_name)
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray):
            out[k] = jax.device_put(v, sharding)
        else:
            out[k] = v
    return out

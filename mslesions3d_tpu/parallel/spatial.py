"""Spatial sharding: split large volumes across chips (context-parallel analog).

The reference sidesteps large volumes by resize/crop (SURVEY.md §5); the TPU
analog of sequence/context parallelism here is sharding the volume's depth
axis over a mesh axis. Under jit with NamedSharding annotations XLA's SPMD
partitioner inserts the conv halo exchanges (ppermute of receptive-field
borders over ICI) automatically — no manual communication code, exactly the
"annotate shardings, let XLA insert collectives" recipe.

Composes with data parallelism on a 2-D ("data", "spatial") mesh: batch
sharded on "data", volume depth on "spatial".
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh_2d(n_data: int, n_spatial: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_data * n_spatial, (
        f"need {n_data * n_spatial} devices, have {len(devices)}"
    )
    grid = np.asarray(devices[: n_data * n_spatial]).reshape(n_data, n_spatial)
    return Mesh(grid, ("data", "spatial"))


def spatial_image_sharding(mesh: Mesh) -> NamedSharding:
    """Images (B, D, H, W, C): batch on "data", depth on "spatial"."""
    axes = mesh.axis_names
    data = "data" if "data" in axes else None
    spatial = "spatial" if "spatial" in axes else axes[0]
    return NamedSharding(mesh, P(data, spatial))


def make_spatially_sharded_forward(model, mesh: Mesh):
    """jitted forward with volume-depth sharding (params replicated).

    Returns fn(variables, images) -> (locs, scores); images may be any
    (B, D, H, W, C) with D divisible by the spatial axis size.
    """
    img_sharding = spatial_image_sharding(mesh)
    replicated = NamedSharding(mesh, P())

    @jax.jit
    def forward(variables, images):
        images = jax.lax.with_sharding_constraint(images, img_sharding)
        return model.apply(variables, images, train=False)

    def run(variables, images):
        variables = jax.device_put(variables, replicated)
        images = jax.device_put(images, img_sharding)
        return forward(variables, images)

    return run

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


def batch_sharding_fn(mesh: Mesh):
    """Per-leaf batch shardings for a ("data", "spatial") mesh.

    Volumes (B, D, H, W, C) shard batch on "data" AND depth on "spatial";
    per-sample leaves (boxes/labels/masks) shard on "data" only. Used by the
    Trainer's --spatial_shards path (train/loop.py) so full-resolution
    volumes that don't fit one chip train across several — the volume analog
    of context parallelism (SURVEY.md §5).
    """
    img = NamedSharding(mesh, P("data", "spatial"))
    rows = NamedSharding(mesh, P("data"))

    def fn(key, value):
        return img if getattr(value, "ndim", 0) >= 5 else rows

    return fn


def shard_batch_spatial(batch: dict, mesh: Mesh) -> dict:
    """device_put a batch dict with depth-sharded volumes (see batch_sharding_fn)."""
    fn = batch_sharding_fn(mesh)
    return {
        k: jax.device_put(v, fn(k, v)) if isinstance(v, np.ndarray) else v
        for k, v in batch.items()
    }


def spatial_activation_interceptor(mesh: Mesh):
    """flax method interceptor: drop the "spatial" axis from deep activations.

    Two reasons, one mechanism:

    * **Correctness.** XLA's SPMD partitioner MISCOMPILES the backward pass
      of a stride-2 conv chain once an activation's depth no longer divides
      the spatial axis (padded shards): gradients come back scaled by
      integer multiples of the shard count while the forward stays exact.
      Reproduced with a 6-layer plain-conv stack — no BatchNorm, grouped
      conv, or explicit padding needed (tools/xla_spmd_bug_repro.py,
      bug A). The cut happens one downsampling EARLY (while depth still
      divides 2*n_spatial), because a constraint placed after a padded
      partition exists cannot help — its backward reshards the cotangent
      back to the padded layout the partitioner chose. Grad-exactness of
      the constrained program is asserted by tests/test_spatial_sharding.py.
    * **Performance.** Deep SSD feature maps are a few KB; halo exchanges
      and padded partitions there cost more than they save. Standard
      spatial-partitioning practice shards only the high-res stages, which
      is exactly what this constraint expresses.

    Install around ``model.apply`` via ``nn.intercept_methods``; it anchors
    both module outputs and 5-D module ARGS (raw lax.conv outputs inside
    DepthwiseSeparableBlock are not module outputs but flow into dw_bn).
    """
    n_spatial = mesh.shape["spatial"]
    # The cut itself must go to FULLY replicated, not P("data"): a
    # batch-sharded cut leaves the depthwise conv feeding it with a
    # 1/n_spatial-scaled weight grad (measured on the toy chain); a P()
    # cut is exact.
    replicated = NamedSharding(mesh, P())

    # NOT re-sharded to a batch layout past the cut: measured per-device
    # memory (tools/tp_story.py, 192^3 b8) is WORSE with a cut->batch
    # reshard (DP4xSP2 1.06x -> 3.92x), a P("data") steady state re-triggers
    # the idle-axis weight-grad scaling (tools/xla_spmd_bug_repro.py,
    # bug B), and the batch-1 large-volume regime — spatial sharding's
    # actual use case — is unaffected by the choice. Plain replication is
    # the verified-exact, measured-cheapest steady state.

    def fix(y):
        # Cut ONE stride-2 layer EARLY: once depth stops dividing
        # 2*n_spatial, the NEXT downsampling conv would emit a padded
        # partition — and a constraint placed after the fact cannot help
        # (its backward reshards the cotangent back to the padded layout
        # the partitioner chose). Cutting while still divisible means a
        # padded spatial partition never exists anywhere in the graph.
        if getattr(y, "ndim", 0) == 5 and y.shape[1] % (2 * n_spatial) != 0:
            return jax.lax.with_sharding_constraint(y, replicated)
        return y

    def interceptor(next_fun, args, kwargs, context):
        # constrain INPUTS too: raw lax.conv outputs (the depthwise half of
        # DepthwiseSeparableBlock) are not module outputs, but they flow
        # into the next module (dw_bn) and get anchored there
        args = tuple(fix(a) for a in args)
        return fix(next_fun(*args, **kwargs))

    return interceptor


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

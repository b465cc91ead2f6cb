"""Tensor (model) parallelism: shard conv channels across a "model" mesh axis.

The reference has no model parallelism of any kind (SURVEY.md §2: strictly
single-GPU). This is the TPU-native tensor-parallel story for a convnet
detector, built the XLA SPMD way: parameters are *annotated* with channel
shardings and the partitioner inserts the collectives — no manual all-gather
or reduce-scatter code (the "annotate shardings, let XLA insert collectives"
recipe; same design as parallel/spatial.py).

Sharding rules (shape-based, so the same rules apply verbatim to Adam's
mu/nu optimizer moments, which mirror the parameter tree):

* backbone conv kernels (3,3,3,Cin,Cout): Cout on "model" — every chip owns
  a channel slice of each layer. Depthwise kernels (3,3,3,1,C) shard their
  group dim the same way: grouped convs partition cleanly along groups.
* prediction-head kernels (3,3,3,Cin,K): K is tiny (6*bpl / n_cls*bpl), so
  Cin is sharded instead — the head conv becomes a partial-sum contraction
  and XLA emits one psum per head output.
* 1-D channel vectors (BN scale/bias/mean/var, rescale_factors): sharded
  when divisible — they follow their conv's output sharding.
* anything non-divisible by the axis size: replicated (correctness first;
  at these model sizes a replicated 4-KB leaf costs nothing).

Composes with data parallelism and spatial (volume-depth) sharding on a 3-D
("data", "spatial", "model") mesh — see make_mesh_3d and the driver dryrun
in __graft_entry__.py.

CAVEAT (jax 0.9.0): the 3-D mesh is demonstration/forward-only for
TRAINING — the SPMD partitioner corrupts conv weight gradients whenever a
spatially-sharded conv coexists with a third mesh axis (forward exact;
tools/xla_spmd_bug_repro.py bug B, pinned by the canary test in
tests/test_tensor_parallel.py). Grad-exact training meshes: 1-D (data) and
2-D (data, spatial) — QUALITY.md "When does spatial/tensor parallelism
win?".
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh_3d(n_data: int, n_spatial: int, n_model: int, devices=None) -> Mesh:
    """("data", "spatial", "model") mesh over the first n_data*n_spatial*n_model devices."""
    devices = devices if devices is not None else jax.devices()
    need = n_data * n_spatial * n_model
    assert len(devices) >= need, f"need {need} devices, have {len(devices)}"
    grid = np.asarray(devices[:need]).reshape(n_data, n_spatial, n_model)
    return Mesh(grid, ("data", "spatial", "model"))


def _leaf_spec(leaf, n_model: int, axis: str) -> P:
    """Channel-sharding PartitionSpec for one model-shaped array (see module
    docstring for the rules). Non-array / non-divisible leaves replicate."""
    shape = getattr(leaf, "shape", None)
    if not shape:
        return P()  # scalars (step counters, schedules)
    if len(shape) == 5:  # conv kernel (kd, kh, kw, Cin, Cout)
        if shape[4] % n_model == 0 and shape[4] >= n_model:
            return P(None, None, None, None, axis)
        if shape[3] % n_model == 0 and shape[3] >= n_model:
            return P(None, None, None, axis, None)  # head: contract sharded Cin
        return P()
    if len(shape) == 1 and shape[0] % n_model == 0 and shape[0] >= n_model:
        return P(axis)
    return P()


def tensor_sharding_tree(tree, mesh: Mesh, axis: str = "model"):
    """Pytree of NamedShardings: channel sharding for every eligible leaf.

    Works on the raw variables dict and on a whole TrainState (params +
    Adam moments share shapes, scalars replicate).
    """
    n_model = mesh.shape[axis]
    return jax.tree_util.tree_map(
        lambda leaf: NamedSharding(mesh, _leaf_spec(leaf, n_model, axis)), tree
    )


def make_tensor_parallel_forward(model, mesh: Mesh, axis: str = "model"):
    """jitted forward with channel-sharded parameters.

    Images are batch-sharded over "data" when the mesh has that axis and
    replicated over "model"; outputs come back replicated so callers see
    ordinary arrays. Returns fn(variables, images) -> (locs, scores).
    """
    data = "data" if "data" in mesh.axis_names else None
    img_sharding = NamedSharding(mesh, P(data))
    replicated = NamedSharding(mesh, P())

    @jax.jit
    def forward(variables, images):
        locs, scores = model.apply(variables, images, train=False)
        locs = jax.lax.with_sharding_constraint(locs, replicated)
        scores = jax.lax.with_sharding_constraint(scores, replicated)
        return locs, scores

    # Cache the channel-sharded parameter placement: re-device_putting the
    # full variable tree on every call wasted a host->device transfer per
    # inference (round-2 advisor finding). The cache holds the source tree
    # too, so an id() collision after GC cannot serve stale placements.
    placed: dict = {}

    def place_variables(variables):
        key = id(variables)
        if key not in placed or placed[key][0] is not variables:
            placed.clear()
            placed[key] = (
                variables,
                jax.device_put(variables, tensor_sharding_tree(variables, mesh, axis)),
            )
        return placed[key][1]

    def run(variables, images):
        images = jax.device_put(images, img_sharding)
        return forward(place_variables(variables), images)

    run.place_variables = place_variables
    return run

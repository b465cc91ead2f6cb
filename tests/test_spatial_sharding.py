"""Spatial-sharding equivalence: volume sharded across devices == unsharded.

XLA SPMD must insert the conv halo exchanges; any missing halo would corrupt
activations near shard boundaries and break this numerical equality.
"""

import numpy as np
import jax
import jax.numpy as jnp

from mslesions3d_tpu.models import SSD3D, SSD3DConfig
from mslesions3d_tpu.parallel.spatial import (
    make_mesh_2d,
    make_spatially_sharded_forward,
)


def test_spatial_sharding_matches_unsharded():
    cfg = SSD3DConfig.create(
        n_classes=2, input_channels=1, input_size=(32, 32, 32), width_mult=0.5,
    )
    model = SSD3D(cfg)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 32, 32, 32, 1)).astype(np.float32)
    )
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    locs_ref, scores_ref = model.apply(variables, x, train=False)

    mesh = make_mesh_2d(n_data=2, n_spatial=4)
    forward = make_spatially_sharded_forward(model, mesh)
    locs_sh, scores_sh = forward(variables, x)

    np.testing.assert_allclose(
        np.asarray(locs_sh), np.asarray(locs_ref), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(scores_sh), np.asarray(scores_ref), rtol=1e-4, atol=1e-4
    )


def test_spatial_only_mesh():
    """Pure spatial split (batch 1, 8-way depth shard): the long-context analog."""
    cfg = SSD3DConfig.create(
        n_classes=2, input_channels=1, input_size=(64, 64, 64), width_mult=0.25,
    )
    model = SSD3D(cfg)
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(1, 64, 64, 64, 1)).astype(np.float32)
    )
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    locs_ref, _ = model.apply(variables, x, train=False)

    mesh = make_mesh_2d(n_data=1, n_spatial=8)
    forward = make_spatially_sharded_forward(model, mesh)
    locs_sh, _ = forward(variables, x)
    np.testing.assert_allclose(
        np.asarray(locs_sh), np.asarray(locs_ref), rtol=1e-4, atol=1e-4
    )

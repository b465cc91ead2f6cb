"""Spatial-sharding equivalence: volume sharded across devices == unsharded.

XLA SPMD must insert the conv halo exchanges; any missing halo would corrupt
activations near shard boundaries and break this numerical equality.
"""

import numpy as np
import pytest
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


@pytest.mark.parametrize("batch", [2, 8])
def test_spatial_sharded_train_step_matches_unsharded(batch):
    """One TRAIN step with a depth-sharded batch == unsharded: the backward
    pass needs the transposed halo exchanges too, and the loss reduction
    crosses the sharded prior axis. Tight tolerance — a single step has no
    chaotic drift, so any boundary error would show directly.

    Parametrized over batch 2 and 8 (per-data-shard batch 1 and 4) so the
    interceptor's replicated cut is exercised with both partial and full
    per-device batches (parallel/spatial.py)."""
    from mslesions3d_tpu.parallel.spatial import shard_batch_spatial
    from mslesions3d_tpu.train.state import create_train_state
    from mslesions3d_tpu.train.steps import make_train_step
    from mslesions3d_tpu.models import model_priors

    cfg = SSD3DConfig.create(
        n_classes=2, input_channels=1, input_size=(16, 16, 16),
        width_mult=0.25, lr=1e-3, threshold=[0.1, 0.2], batch_size=batch,
    )
    model = SSD3D(cfg)
    priors = model_priors(cfg)
    mesh = make_mesh_2d(n_data=2, n_spatial=4)
    step = make_train_step(cfg, model, priors, donate=False, return_grads=True)
    # the constraint interceptor is REQUIRED for sharded batches: without it
    # XLA miscompiles the deep backbone's backward (grads x4 at 16^3/4 shards)
    step_sh = make_train_step(cfg, model, priors, donate=False,
                              return_grads=True, constraint_mesh=mesh)

    rng = np.random.default_rng(7)
    B = batch
    batch = {
        "image": rng.normal(0, 1, (B, 16, 16, 16, 1)).astype(np.float32),
        "boxes": np.tile(np.array([0.2, 0.2, 0.2, 0.6, 0.6, 0.6], np.float32),
                         (B, 3, 1)),
        "labels": np.ones((B, 3), np.int32),
        "box_mask": np.ones((B, 3), bool),
        "batch_mask": np.ones(B, bool),
    }
    key = jax.random.PRNGKey(11)

    state_ref = create_train_state(model, cfg, jax.random.PRNGKey(0))
    state_ref, m_ref = step(state_ref, batch, key)

    state_sh = create_train_state(model, cfg, jax.random.PRNGKey(0))
    state_sh, m_sh = step_sh(state_sh, shard_batch_spatial(batch, mesh), key)

    np.testing.assert_allclose(float(m_sh["total_loss"]),
                               float(m_ref["total_loss"]), rtol=1e-5)
    # compare GRADIENTS, not post-step params: a first Adam step is
    # ~= -lr*sign(g), so a near-zero g element flips sign on a 1e-7
    # reduction-order difference and moves the param by a full 2*lr.
    # These tolerances are diagnostic, not cosmetic: WITHOUT the
    # constraint_mesh interceptor the partitioner miscompiles the deep
    # backbone's backward and whole leaves come back x2/x4 (see
    # parallel/spatial.py::spatial_activation_interceptor) — any such
    # regression fails this by orders of magnitude. atol 1e-3 only
    # absorbs partitioned-reduction noise (grads here range to ~1e2).
    for a, b in zip(jax.tree_util.tree_leaves(m_sh["grads"]),
                    jax.tree_util.tree_leaves(m_ref["grads"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)


def test_spatial_sharded_train_step_convnet_backbone():
    """The interceptor's shape-based cut must hold for the ConvNet backbone
    too (MONAI-style Convolution blocks + functional max_pool between
    modules — pooled tensors are anchored as the next module's ARG)."""
    from mslesions3d_tpu.parallel.spatial import shard_batch_spatial
    from mslesions3d_tpu.train.state import create_train_state
    from mslesions3d_tpu.train.steps import make_train_step
    from mslesions3d_tpu.models import model_priors

    cfg = SSD3DConfig.create(
        n_classes=2, input_channels=1, input_size=(32, 32, 32),
        base_network_config="convnet_maxpool_double",
        aspect_ratios={6: [1.0], 9: [1.0]},
        lr=1e-3, threshold=[0.1, 0.2], batch_size=2,
    )
    model = SSD3D(cfg)
    priors = model_priors(cfg)
    mesh = make_mesh_2d(n_data=2, n_spatial=4)
    step = make_train_step(cfg, model, priors, donate=False, return_grads=True)
    step_sh = make_train_step(cfg, model, priors, donate=False,
                              return_grads=True, constraint_mesh=mesh)

    rng = np.random.default_rng(5)
    batch = {
        "image": rng.normal(0, 1, (2, 32, 32, 32, 1)).astype(np.float32),
        "boxes": np.tile(np.array([0.2, 0.2, 0.2, 0.6, 0.6, 0.6], np.float32),
                         (2, 2, 1)),
        "labels": np.ones((2, 2), np.int32),
        "box_mask": np.ones((2, 2), bool),
        "batch_mask": np.ones(2, bool),
    }
    key = jax.random.PRNGKey(3)

    state_ref = create_train_state(model, cfg, jax.random.PRNGKey(0))
    _, m_ref = step(state_ref, batch, key)
    state_sh = create_train_state(model, cfg, jax.random.PRNGKey(0))
    _, m_sh = step_sh(state_sh, shard_batch_spatial(batch, mesh), key)

    np.testing.assert_allclose(float(m_sh["total_loss"]),
                               float(m_ref["total_loss"]), rtol=1e-5)
    # atol 5e-3: PReLU's sign-dependent grad amplifies partitioned-reduction
    # noise at activation zero-crossings (measured worst 1.9e-3 over 442k
    # elements); a miscompile regression scales WHOLE leaves x2/x4
    for a, b in zip(jax.tree_util.tree_leaves(m_sh["grads"]),
                    jax.tree_util.tree_leaves(m_ref["grads"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=5e-3)


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


def test_spatial_sharded_train_step_with_augment_ns2():
    """Flip augmentation + spatial sharding at n_spatial=2 (regression).

    The flip is a separable resample contracting over the sharded depth
    axis; before train/steps.py pinned the augmented image back to the
    canonical (data, spatial) layout, the partitioner's layout choice for
    that contraction put the conv chain's backward in the bug-A regime:
    whole grad leaves came back x2 (max |dev| ~2.0) while forward/loss
    stayed exact. n_spatial=4 was coincidentally unaffected, which is why
    the original equivalence tests missed it (found by the round-4
    dryrun_multichip equality assertion; tools/xla_spmd_bug_repro.py bug C).
    """
    from mslesions3d_tpu.data.augment import AugmentConfig
    from mslesions3d_tpu.parallel.spatial import shard_batch_spatial
    from mslesions3d_tpu.train.state import create_train_state
    from mslesions3d_tpu.train.steps import make_train_step
    from mslesions3d_tpu.models import model_priors

    cfg = SSD3DConfig.create(
        n_classes=2, input_channels=1, input_size=(16, 16, 16),
        width_mult=0.25, lr=1e-3, threshold=[0.1, 0.2], batch_size=4,
    )
    model = SSD3D(cfg)
    priors = model_priors(cfg)
    augment = AugmentConfig(flip_axes=(0, 1, 2))
    mesh = make_mesh_2d(n_data=2, n_spatial=2)
    step = make_train_step(cfg, model, priors, augment=augment,
                           donate=False, return_grads=True)
    step_sh = make_train_step(cfg, model, priors, augment=augment,
                              donate=False, return_grads=True,
                              constraint_mesh=mesh)

    rng = np.random.default_rng(7)
    B = 4
    batch = {
        "image": rng.normal(0, 1, (B, 16, 16, 16, 1)).astype(np.float32),
        "boxes": np.tile(np.array([0.2, 0.2, 0.2, 0.6, 0.6, 0.6], np.float32),
                         (B, 1, 1)),
        "labels": np.ones((B, 1), np.int32),
        "box_mask": np.ones((B, 1), bool),
        "batch_mask": np.ones(B, bool),
    }
    key = jax.random.PRNGKey(11)

    state_ref = create_train_state(model, cfg, jax.random.PRNGKey(0))
    _, m_ref = step(state_ref, batch, key)
    state_sh = create_train_state(model, cfg, jax.random.PRNGKey(0))
    _, m_sh = step_sh(state_sh, shard_batch_spatial(batch, mesh), key)

    np.testing.assert_allclose(float(m_sh["total_loss"]),
                               float(m_ref["total_loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(m_sh["grads"]),
                    jax.tree_util.tree_leaves(m_ref["grads"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)

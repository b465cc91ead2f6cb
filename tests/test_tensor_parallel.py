"""Tensor (channel) parallelism: sharded == unsharded, alone and composed
with data + spatial axes on a 3-D mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mslesions3d_tpu.models import SSD3D, SSD3DConfig, model_priors
from mslesions3d_tpu.parallel import (
    make_mesh_3d,
    make_tensor_parallel_forward,
    tensor_sharding_tree,
)

pytestmark = pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")


def _build(input_channels=1):
    config = SSD3DConfig.create(
        n_classes=2, input_channels=input_channels, input_size=(24, 24, 24),
        width_mult=0.25, lr=1e-3, threshold=[0.1, 0.2],
    )
    model = SSD3D(config)
    images = jnp.asarray(
        np.random.default_rng(0).normal(0, 1, (2, 24, 24, 24, input_channels)),
        jnp.float32,
    )
    variables = model.init(jax.random.PRNGKey(0), images, train=False)
    return config, model, variables, images


def test_tensor_parallel_forward_matches_unsharded():
    config, model, variables, images = _build()
    ref_locs, ref_scores = model.apply(variables, images, train=False)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("model",))
    fwd = make_tensor_parallel_forward(model, mesh)
    locs, scores = fwd(variables, images)
    np.testing.assert_allclose(np.asarray(locs), np.asarray(ref_locs),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(scores), np.asarray(ref_scores),
                               rtol=1e-5, atol=1e-5)


def test_sharding_rules():
    """Backbone kernels shard Cout, head kernels shard Cin, tiny/odd leaves
    replicate."""
    config, model, variables, _ = _build()
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 2, 2),
                ("data", "spatial", "model"))
    tree = tensor_sharding_tree(variables, mesh)
    params = tree["params"]
    assert params["backbone"]["layer_7"]["pw_conv"]["kernel"].spec == \
        P(None, None, None, None, "model")
    # head Cout (4 / 12) not divisible by 2? 12 is, 4 is — but Cin rule only
    # fires when Cout is NOT shardable; with bpl=2 defaults cls K = 4,
    # loc K = 12, both divisible by 2, so Cout shards.
    cls_spec = params["heads"]["cls_3"]["kernel"].spec
    assert cls_spec in (P(None, None, None, None, "model"),
                        P(None, None, None, "model", None))
    # layer_0 input channel dim (1) never sharded
    assert params["backbone"]["layer_0"]["conv"]["kernel"].spec[3] is None


def test_tensor_parallel_train_step_3d_mesh():
    """Full train step on a (data, spatial, model) 2x2x2 mesh matches the
    single-device step (params + Adam moments channel-sharded)."""
    from mslesions3d_tpu.train import create_train_state, make_train_step

    config, model, variables, images = _build()
    priors = model_priors(config)
    batch = {
        "image": np.asarray(images),
        "boxes": np.tile(np.asarray([[0.2, 0.2, 0.2, 0.6, 0.6, 0.6]], np.float32),
                          (2, 1, 1)),
        "labels": np.ones((2, 1), np.int32),
        "box_mask": np.ones((2, 1), bool),
        "batch_mask": np.ones((2,), bool),
    }

    state = create_train_state(model, config, jax.random.PRNGKey(0))
    step = make_train_step(config, model, priors, donate=False,
                           return_grads=True)
    _, ref_metrics = step(state, {k: jnp.asarray(v) for k, v in batch.items()},
                          jax.random.PRNGKey(1))

    mesh = make_mesh_3d(2, 2, 2)
    # the spatial axis REQUIRES the activation-constraint mesh or the deep
    # backbone's backward miscompiles (parallel/spatial.py) — this test
    # asserts GRADIENTS, not just the (always-exact) forward loss
    step_sh = make_train_step(config, model, priors, donate=False,
                              return_grads=True, constraint_mesh=mesh)
    state_sh = create_train_state(model, config, jax.random.PRNGKey(0))
    state_sh = jax.device_put(state_sh, tensor_sharding_tree(state_sh, mesh))
    sharded_batch = {
        k: jax.device_put(
            v, NamedSharding(mesh, P("data", "spatial") if k == "image" else P("data"))
        )
        for k, v in batch.items()
    }
    _, metrics = step_sh(state_sh, sharded_batch, jax.random.PRNGKey(1))
    # FORWARD-only equivalence, deliberately: on jax 0.9.0 the SPMD
    # partitioner returns corrupted conv weight GRADIENTS whenever a
    # spatially-sharded conv coexists with a third mesh axis (clean x2 on
    # the stem with replicated params; 3-26% errors across many leaves with
    # channel-sharded params). Minimal repro + workaround analysis:
    # tools/xla_spmd_bug_repro.py; test_xla_idle_axis_bug_canary pins the
    # bug so a fixing jax upgrade fails loudly. Until then the 3-D mesh is
    # a forward/demo configuration; the verified grad-exact training meshes
    # are 1-D (data) and 2-D (data, spatial) — tests/test_spatial_sharding.py.
    np.testing.assert_allclose(float(metrics["total_loss"]),
                               float(ref_metrics["total_loss"]), rtol=1e-4)
    for g in jax.tree_util.tree_leaves(metrics["grads"]):
        assert np.isfinite(np.asarray(g)).all()


def test_xla_idle_axis_bug_canary():
    """Pins the upstream SPMD bug (tools/xla_spmd_bug_repro.py, bug B): a
    conv whose input is spatially sharded on a >=3-axis mesh gets its kernel
    grad scaled by the idle-axis size. When a jax upgrade fixes it, this
    FAILS — then delete it and lift the stem quarantine in
    test_tensor_parallel_train_step_3d_mesh (and consider promoting the 3-D
    mesh past demonstration-only)."""
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 2, 2),
                ("data", "spatial", "model"))
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (2, 24, 8, 8, 1)).astype(np.float32)
    w = rng.normal(0, 0.3, (3, 3, 3, 1, 8)).astype(np.float32)

    def loss(w, x):
        y = jax.lax.conv_general_dilated(
            x, w, (2, 2, 2), ((1, 1), (1, 1), (1, 1)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        return jnp.mean(jax.nn.relu(y) ** 2)

    g = jax.jit(jax.grad(loss))
    ref = np.asarray(g(w, x))
    sh = np.asarray(g(w, jax.device_put(
        x, NamedSharding(mesh, P("data", "spatial")))))
    np.testing.assert_allclose(sh, 2.0 * ref, rtol=1e-4, atol=1e-6)


def test_multihost_helpers_single_process():
    """Multi-host helpers degenerate correctly in a single process (the mesh
    math itself is what multi-process runs reuse)."""
    import jax
    import numpy as np
    from mslesions3d_tpu.parallel import (
        dcn_friendly_mesh, initialize_multihost, process_batch_slice,
    )

    assert initialize_multihost() is False  # single process: no-op
    assert process_batch_slice(8) == slice(0, 8)

    mesh = dcn_friendly_mesh()  # (data=8, model=1) on the CPU mesh
    assert mesh.shape["data"] == jax.device_count()
    assert mesh.shape["model"] == 1

    mesh2 = dcn_friendly_mesh(data_per_slice=4)  # 8 local chips -> model=2
    assert mesh2.shape["model"] == 2
    assert mesh2.shape["data"] == jax.device_count() // 2

    # the sharded step must compile over a dcn_friendly mesh's data axis
    from mslesions3d_tpu.parallel import shard_batch
    from mslesions3d_tpu.models import SSD3D, SSD3DConfig, model_priors
    from mslesions3d_tpu.train import create_train_state, make_train_step

    cfg = SSD3DConfig.create(
        n_classes=2, input_channels=1, input_size=(16, 16, 16), width_mult=0.25,
        threshold=[0.1, 0.2],
    )
    model = SSD3D(cfg)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg, model, model_priors(cfg), donate=False)
    rng = np.random.default_rng(0)
    batch = {
        "image": rng.normal(0, 1, (8, 16, 16, 16, 1)).astype(np.float32),
        "boxes": np.tile(np.asarray([[0.2, 0.2, 0.2, 0.6, 0.6, 0.6]], np.float32), (8, 1, 1)),
        "labels": np.ones((8, 1), np.int32),
        "box_mask": np.ones((8, 1), bool),
        "batch_mask": np.ones((8,), bool),
    }
    sharded = shard_batch(batch, mesh)
    _, m = step(state, sharded, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["total_loss"]))

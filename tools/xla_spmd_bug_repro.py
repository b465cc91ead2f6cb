"""Minimal reproducer: XLA SPMD conv weight-grad miscompiles (jax 0.9.0).

Two distinct wrong-gradient bugs in the SPMD partitioner, both with an
EXACT forward pass, found while building the spatial-sharding training path
(parallel/spatial.py). Run on any backend:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/xla_spmd_bug_repro.py

Bug A — padded spatial partitions poison stride-2 chains (2-axis mesh):
    a stack of plain convs whose depth shrinks below the spatial axis size
    (16 -> 2 over 4 shards) returns weight grads scaled x2/x4 while the
    loss is exact. No BatchNorm / grouped conv / explicit padding needed.
    Workaround (shipped): constrain activations off the spatial axis one
    downsampling early, to FULLY replicated — a P("data") cut is itself
    wrong (the depthwise conv feeding it comes back x 1/n_spatial); P() is
    exact. See parallel/spatial.py::spatial_activation_interceptor.

Bug C — flip-resample feeding the conv chain, n_spatial=2 (2-axis mesh):
    the framework's device-side flip augmentation (three per-sample
    interpolation-matrix tensordots, data/augment.py::separable_resample)
    feeding the depthwise-separable backbone returns whole conv-weight-grad
    leaves x2 at n_spatial=2 (n_spatial=4 unaffected; forward/loss exact;
    ANY flip axis triggers it, including axes that are not sharded).
    Isolation status: toy distillations do NOT reproduce it — plain or
    depthwise conv chains fed by static/per-sample flip matmuls (with and
    without the bug-A replicated cut) are all grad-exact, so the trigger
    needs more of the real model structure; bug_c() below reproduces it
    with the framework's own augment+backbone at 16^3 in a few seconds.
    Workaround (shipped): pin the augmented image back to the canonical
    P("data", "spatial") layout before the backbone (train/steps.py);
    pinned by tests/test_spatial_sharding.py::
    test_spatial_sharded_train_step_with_augment_ns2.

Bug B — an idle third mesh axis doubles conv weight grads (3-axis mesh):
    ONE conv, input sharded P("data", "spatial") on a ("data", "spatial",
    "model") mesh with the model axis unused by any operand: grad wrt the
    kernel is exactly x idle-axis-size. Triggers under both the Shardy and
    legacy GSPMD partitioners; independent of stride/C_in/depth/committed-
    ness of the weights; NOT fixed by with_sharding_constraint, x*1.0, or
    lax.optimization_barrier on the input; vanishes when spatial=1 or when
    the mesh has only two axes. No workaround found short of not training
    convs on meshes with idle axes — so the framework's 3-D
    (data, spatial, model) mesh is a forward/demo configuration and the
    verified training meshes are 1-D (data) and 2-D (data, spatial)
    (tests/test_spatial_sharding.py asserts grad-exactness there).
"""

from __future__ import annotations

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# Force CPU unless REPRO_PLATFORM says otherwise. Two traps on this box:
# (a) the ambient environment sets JAX_PLATFORMS=axon, and (b) probing
# jax.default_backend() to decide would itself initialize the axon backend,
# which hangs forever on a dead TPU tunnel. REPRO_PLATFORM=axon runs the
# repro on the real chip.
jax.config.update("jax_platforms", os.environ.get("REPRO_PLATFORM", "cpu"))

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def conv(x, w, stride=1):
    return jax.lax.conv_general_dilated(
        x, w, (stride,) * 3, ((1, 1), (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def ratio(sharded, ref):
    a, b = np.asarray(sharded).ravel(), np.asarray(ref).ravel()
    big = np.abs(b) > 1e-5
    return float(np.median(a[big] / b[big]))


def bug_a():
    """Stride-2 chain, depth 16 -> 2 over spatial=4: grads x2."""
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("data", "spatial"))
    rng = np.random.default_rng(0)
    C, S = 4, [2, 1, 2, 1, 2, 1]
    ws = [rng.normal(0, 0.3, (3, 3, 3, C, C)).astype(np.float32) for _ in S]
    x = rng.normal(0, 1, (2, 16, 8, 8, C)).astype(np.float32)

    def loss(ws, x):
        for w, s in zip(ws, S):
            x = jax.nn.relu(conv(x, w, s))
        return jnp.mean(x ** 2)

    g = jax.jit(jax.grad(loss))
    ref = g(ws, x)
    sh = g(ws, jax.device_put(x, NamedSharding(mesh, P("data", "spatial"))))
    print("bug A (expect 1.0, observe ~2.0):",
          [f"{ratio(a, b):.2f}" for a, b in zip(sh, ref)])


def bug_b():
    """One conv + idle third mesh axis: kernel grad x idle-axis size."""
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 2, 2),
                ("data", "spatial", "model"))
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (2, 24, 8, 8, 1)).astype(np.float32)
    w = rng.normal(0, 0.3, (3, 3, 3, 1, 8)).astype(np.float32)

    def loss(w, x):
        return jnp.mean(jax.nn.relu(conv(x, w, 2)) ** 2)

    g = jax.jit(jax.grad(loss))
    ref = g(w, x)
    sh = g(w, jax.device_put(x, NamedSharding(mesh, P("data", "spatial"))))
    print(f"bug B (expect 1.0, observe ~2.0): {ratio(sh, ref):.2f}")
    print("forward exact:",
          bool(abs(float(jax.jit(loss)(w, x))
                   - float(jax.jit(loss)(w, jax.device_put(
                       x, NamedSharding(mesh, P("data", "spatial")))))) < 1e-6))


def bug_c():
    """Flip augmentation + spatial sharding at n_spatial=2: conv grads x2.

    Reconstructs the UNPINNED pre-fix step from public pieces: augment the
    batch, run the backbone under the spatial-activation interceptor (the
    bug-A workaround), WITHOUT re-pinning the augmented image's layout.
    """
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from flax import linen as nn

    from mslesions3d_tpu.data.augment import AugmentConfig, augment_batch
    from mslesions3d_tpu.models import SSD3D, SSD3DConfig, model_priors
    from mslesions3d_tpu.models.losses import multibox_loss_from_config
    from mslesions3d_tpu.parallel.spatial import (
        make_mesh_2d, shard_batch_spatial, spatial_activation_interceptor,
    )

    config = SSD3DConfig.create(
        n_classes=2, input_channels=1, input_size=(16, 16, 16),
        width_mult=0.25, threshold=[0.1, 0.2],
    )
    model = SSD3D(config)
    priors = jnp.asarray(model_priors(config))
    augment = AugmentConfig(flip_axes=(0, 1, 2))
    mesh = make_mesh_2d(n_data=4, n_spatial=2)

    rng = np.random.default_rng(0)
    B = 4
    batch = {
        "image": rng.normal(0, 1, (B, 16, 16, 16, 1)).astype(np.float32),
        "boxes": np.tile(np.asarray([[0.2, 0.2, 0.2, 0.6, 0.6, 0.6]],
                                    np.float32), (B, 1, 1)),
        "labels": np.ones((B, 1), np.int32),
        "box_mask": np.ones((B, 1), bool),
    }
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((B, 16, 16, 16, 1)), train=False)
    key = jax.random.PRNGKey(1)

    def loss(params, b):
        images, boxes = augment_batch(key, b["image"], b["boxes"], augment)
        # NOTE: no with_sharding_constraint on `images` here — this is the
        # pre-fix program; train/steps.py now pins P("data", "spatial")
        with nn.intercept_methods(spatial_activation_interceptor(mesh)):
            (locs, scores), _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                images, train=True, mutable=["batch_stats"],
                rngs={"dropout": key},
            )
        conf, loc = multibox_loss_from_config(
            config, locs, scores, boxes, b["labels"], b["box_mask"], priors)
        return conf + config.alpha * loc

    g = jax.jit(jax.grad(loss))
    ref = g(variables["params"], batch)
    sh = g(variables["params"], shard_batch_spatial(batch, mesh))
    ratios = sorted(
        r for r in (
            ratio(a, b)
            for a, b in zip(jax.tree_util.tree_leaves(sh),
                            jax.tree_util.tree_leaves(ref))
        ) if np.isfinite(r)  # near-zero leaves have no meaningful ratio
    )
    print(f"bug C (expect all 1.0, observe x2 leaves): "
          f"min {ratios[0]:.2f} max {ratios[-1]:.2f}, "
          f"{sum(r > 1.5 for r in ratios)}/{len(ratios)} leaves >1.5x")


if __name__ == "__main__":
    print(f"jax {jax.__version__}, {len(jax.devices())} devices "
          f"({jax.devices()[0].platform})")
    bug_a()
    bug_b()
    bug_c()

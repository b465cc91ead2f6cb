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

if jax.default_backend() not in ("cpu", "tpu"):  # pragma: no cover
    jax.config.update("jax_platforms", "cpu")

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


if __name__ == "__main__":
    print(f"jax {jax.__version__}, backend {jax.default_backend()}, "
          f"{len(jax.devices())} devices")
    bug_a()
    bug_b()

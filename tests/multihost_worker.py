"""Worker process for the 2-process multihost smoke test.

Launched (twice) by tests/test_multihost_smoke.py with
  python tests/multihost_worker.py <process_id> <coordinator_port>

Each worker owns 4 virtual CPU devices; after jax.distributed.initialize the
global runtime sees 2 processes x 4 devices = 8. The worker builds the
DCN-friendly mesh, feeds its process_batch_slice rows of a deterministic
global batch, runs ONE real data-parallel train step of the framework's
SSD3D trainer, and prints the resulting global loss — which must match the
single-process 8-device value computed by the test harness.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _configure_worker():
    """Worker-process jax setup; NOT run on import (the test harness imports
    make_setup/run_step from this module inside the pytest process)."""
    # Drop an inherited xla_force_host_platform_device_count (the pytest
    # parent's conftest sets it) — it conflicts with jax_num_cpu_devices.
    os.environ["XLA_FLAGS"] = " ".join(
        f for f in os.environ.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    # This machine's sitecustomize pre-imports jax (axon plugin), so env vars
    # are too late — force the platform/devices through jax.config BEFORE
    # jax.distributed.initialize (which itself must precede backend init).
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")


def make_setup():
    """Deterministic tiny config + batch, shared with the test harness."""
    import numpy as np

    from mslesions3d_tpu.models import SSD3DConfig

    # tower truncated at layer 3 (aspect_ratios keys) — this test validates
    # multihost mechanics (init, mesh, batch slicing, global collectives),
    # and each worker pays a full fresh compile (see main(): no cache), so
    # the model is kept as small as the backbone contract allows
    cfg = SSD3DConfig.create(
        n_classes=2, input_channels=1, input_size=(16, 16, 16),
        width_mult=0.25, threshold=[0.1, 0.2], lr=1e-3, batch_size=8,
        aspect_ratios={2: [1.0], 3: [1.0]},
    )
    rng = np.random.default_rng(42)
    batch = {
        "image": rng.normal(0, 1, (8, 16, 16, 16, 1)).astype(np.float32),
        "boxes": np.tile(np.asarray([[0.2, 0.2, 0.2, 0.6, 0.6, 0.6]],
                                    np.float32), (8, 1, 1)),
        "labels": np.ones((8, 1), np.int32),
        "box_mask": np.ones((8, 1), bool),
        "batch_mask": np.ones((8,), bool),
    }
    return cfg, batch


def run_step(cfg, batch, mesh, multihost: bool):
    """One DP train step over ``mesh``; returns the global total_loss."""
    import jax
    import numpy as np
    from jax.sharding import PartitionSpec as P

    from mslesions3d_tpu.models import SSD3D, model_priors
    from mslesions3d_tpu.parallel import shard_batch
    from mslesions3d_tpu.parallel.multihost import make_global, shard_global_batch
    from mslesions3d_tpu.train import create_train_state, make_train_step

    model = SSD3D(cfg)
    priors = model_priors(cfg)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg, model, priors, donate=False)
    key = jax.random.PRNGKey(7)
    if multihost:
        state = make_global(state, mesh, P())
        key = make_global(key, mesh, P())
        sharded = shard_global_batch(batch, mesh)
    else:
        sharded = shard_batch(batch, mesh)
    _, metrics = step(state, sharded, key)
    return float(np.asarray(jax.device_get(metrics["total_loss"])))


def main():
    pid = int(sys.argv[1])
    port = sys.argv[2]
    _configure_worker()

    from mslesions3d_tpu.parallel import (
        dcn_friendly_mesh,
        initialize_multihost,
        process_batch_slice,
    )

    ok = initialize_multihost(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
    )
    assert ok, "initialize_multihost must report a multi-process runtime"

    import jax

    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4

    # The persistent compile cache is deliberately NOT enabled here, and the
    # suite's inherited MSL_JAX_CACHE is dropped. SPMD peers hang in Gloo
    # context init (GetKeyValue DEADLINE_EXCEEDED) whenever their
    # executables' collective schedules differ, and the cache creates
    # exactly that asymmetry: a worker replaying a cached executable against
    # a peer that compiled fresh (or replays a different entry) runs
    # communicator setups its peer never starts — observed as one worker
    # opening 2-party Gloo contexts while the other waits on the 8-party
    # one. Same hazard class as the driver dryrun's stale-AOT failure
    # (round 1), same cure: multi-process runs compile fresh, symmetrically.
    os.environ.pop("MSL_JAX_CACHE", None)
    import jax as _jax

    _jax.config.update("jax_compilation_cache_dir", None)

    mesh = dcn_friendly_mesh()
    assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1
    sl = process_batch_slice(8)
    assert sl == slice(pid * 4, pid * 4 + 4), sl

    # Establish the Gloo communicator NOW with a trivial collective: its
    # compile is seconds, so both processes reach it nearly together. The
    # REAL train-step compile below takes tens of seconds per process on a
    # 1-core host, and the OS can schedule them back-to-back — without this
    # warm-up, the first collective execution then initializes the Gloo
    # context with >30 s of skew and times out (GetKeyValue DEADLINE_EXCEEDED).
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("msl_multihost_smoke_warmup")

    cfg, batch = make_setup()
    loss = run_step(cfg, batch, mesh, multihost=True)
    print(f"MULTIHOST_LOSS {loss:.6f}", flush=True)


if __name__ == "__main__":
    main()

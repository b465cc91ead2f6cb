"""Bug D repro/probe: cache-deserialized sharded-step executables corrupt the heap.

Bug D (BUGS.md): on the forced-8-device XLA:CPU backend (jax 0.9.0), executing
the sharded gathered PATCH-TRAINING train step from an executable DESERIALIZED
out of the persistent compilation cache corrupts the process heap — raw
SIGABRT, no XLA diagnostic, crash site wandering between later pjit calls and
device_get. The same program compiled fresh in-process never crashes, and
donation is not the trigger (disabling donate_argnums still crashed 5/7 warm
runs). Shipped mitigation: utils/cache.py::quarantine_from_persistent_cache
compiles the family fresh on CPU backends.

Modes (two child runs against ONE cache dir; run 1 compiles+caches, run 2
deserializes):

  python tools/bugd_repro.py            probe: quarantine DISABLED. Child 2
                                        aborting (rc 134/-6) == bug still
                                        present in this jax. ~60%/run flake,
                                        so --runs 3 gives ~94% detection.
  python tools/bugd_repro.py --quarantined
                                        mitigation check: quarantine ON; every
                                        child must exit 0.
  python tools/bugd_repro.py --child --cache DIR   (internal) one training run

Upgrade playbook: run the probe after every jax/jaxlib bump. If NO child
aborts across --runs 3, the upstream bug is likely fixed — the quarantine in
utils/cache.py can then be retired (and the jitted model.init revisited, see
train/state.py NOTE).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import tempfile


def child(cache_dir: str) -> None:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["MSL_JAX_CACHE"] = cache_dir

    import jax

    jax.config.update("jax_platforms", "cpu")
    import tempfile as _tf

    import numpy as np

    from mslesions3d_tpu.data.datasets import SyntheticDataModule
    from mslesions3d_tpu.data.generate import generate_dataset
    from mslesions3d_tpu.models import SSD3DConfig
    from mslesions3d_tpu.train.loop import Trainer, TrainerConfig
    from mslesions3d_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    # EXACT mirror of tests/test_patches.py::test_trainer_patch_training_
    # data_parallel — the program must match bit-for-bit for the corrupting
    # cache entry to be the one deserialized (a minimal direct-step version
    # of the same program family did NOT reproduce: the corruption is
    # content-specific, 0/4 warm aborts vs 5/8 for this exact scenario)
    tmp = _tf.mkdtemp(prefix="bugd_work_")
    root = generate_dataset(
        os.path.join(tmp, "data"), num_images=16, n_classes=1,
        image_size=(24, 24, 24), object_size=(5, 8), num_objects=(1, 2),
        seed=6, subdir="ds",
    )
    dm = SyntheticDataModule(data_dir=root, n_classes=1, batch_size=8,
                             max_objects=8)
    dm.setup("fit")
    cfg = SSD3DConfig.create(
        n_classes=2, input_channels=1, input_size=(16, 16, 16),
        width_mult=0.25, lr=1e-3, threshold=[0.1, 0.2], batch_size=8,
    )
    tcfg = TrainerConfig(
        logdir=os.path.join(tmp, "logs"), experiment_name="patch_dp",
        max_epochs=1, compute_metric_every_n_epochs=1,
        early_stopping=False, verbose=False, data_parallel=True,
        patch_training=True, grad_hist_every_n_steps=0,
    )
    state, result = Trainer(tcfg).fit(cfg, dm)
    assert int(state.step) > 0
    assert np.isfinite(result["history"][-1]["avg_val_loss"])
    print("CHILD_OK", flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--cache", default=None)
    ap.add_argument("--quarantined", action="store_true",
                    help="keep the shipped quarantine active (mitigation check)")
    ap.add_argument("--runs", type=int, default=2,
                    help="total child runs against the one cache dir")
    args = ap.parse_args()

    if args.child:
        child(args.cache or tempfile.mkdtemp(prefix="bugd_cache_"))
        return 0

    cache = args.cache or tempfile.mkdtemp(prefix="bugd_cache_")
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else [])
    )
    if args.quarantined:
        env.pop("MSL_DISABLE_BUGD_QUARANTINE", None)
    else:
        env["MSL_DISABLE_BUGD_QUARANTINE"] = "1"

    rcs = []
    for i in range(args.runs):
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child",
             "--cache", cache],
            env=env, capture_output=True, text=True, timeout=1200,
        )
        ok = p.returncode == 0 and "CHILD_OK" in p.stdout
        rcs.append(p.returncode)
        print(f"run {i + 1}/{args.runs}: rc={p.returncode} "
              f"{'ok' if ok else 'ABORTED/FAILED'}", flush=True)

    if args.quarantined:
        bad = [rc for rc in rcs if rc != 0]
        print("MITIGATION:", "HOLDS" if not bad else f"BROKEN {rcs}")
        return 1 if bad else 0
    # probe: the FIRST run compiles fresh and must pass; later runs
    # deserialize and abort while the bug is present
    if rcs[0] != 0:
        print(f"PROBE: INVALID (fresh-compile run failed rc={rcs[0]})")
        return 2
    crashed = [rc for rc in rcs[1:] if rc != 0]
    print("PROBE:", f"BUG PRESENT ({len(crashed)}/{len(rcs) - 1} warm runs aborted)"
          if crashed else "not reproduced — bug may be fixed upstream; "
          "consider retiring the quarantine (utils/cache.py)")
    return 0


if __name__ == "__main__":
    sys.exit(main())

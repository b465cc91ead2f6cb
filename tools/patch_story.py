"""Measure what on-device patch training buys at full-resolution geometry.

The reference cannot train at native BIDS resolution (its pipeline resizes
to a fixed shape, reference datasets.py:206); this framework offers two
full-resolution paths: spatial sharding (`--spatial_shards`,
tools/tp_story.py) and lesion-biased patch training (`--patch_size`,
data/patches.py). This script puts NUMBERS on the patch path: it compiles
the real train step (patch sampling + crop + forward + MultiBox loss +
backward + Adam) with FULL volumes as inputs under several (volume, patch,
batch) geometries and reports XLA's per-device memory analysis — the same
hardware-independent methodology as tp_story.py (one per-device executable;
no execution needed).

Usage: python tools/patch_story.py [--volume 192] [--width 1.0]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from __graft_entry__ import _force_cpu_mesh  # noqa: E402


def fmt(n):
    return f"{n / 2**30:.2f} GiB"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--volume", type=int, default=192, help="full volume edge")
    p.add_argument("--width", type=float, default=1.0)
    args = p.parse_args()

    _force_cpu_mesh(1)

    import jax
    import numpy as np

    from mslesions3d_tpu.models import SSD3D, SSD3DConfig, model_priors
    from mslesions3d_tpu.train import create_train_state, make_train_step

    V = args.volume
    rows = []

    def measure(label, input_size, batch, full_size, patch_training,
                grad_accum=1):
        config = SSD3DConfig.create(
            n_classes=2, input_channels=1, input_size=input_size,
            width_mult=args.width, lr=1e-3, threshold=[0.1, 0.2],
            dtype="bfloat16",
        )
        model = SSD3D(config)
        priors = model_priors(config)
        state = create_train_state(model, config, jax.random.PRNGKey(0))
        step = make_train_step(config, model, priors, augment=None,
                               donate=False, patch_training=patch_training,
                               grad_accum=grad_accum)
        batch_spec = {
            "image": jax.ShapeDtypeStruct((batch, *full_size, 1), np.float32),
            "boxes": jax.ShapeDtypeStruct((batch, 4, 6), np.float32),
            "labels": jax.ShapeDtypeStruct((batch, 4), np.int32),
            "box_mask": jax.ShapeDtypeStruct((batch, 4), bool),
            "batch_mask": jax.ShapeDtypeStruct((batch,), bool),
        }
        state_abs = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state)
        key = jax.ShapeDtypeStruct((2,), np.uint32)
        ma = step.lower(state_abs, batch_spec, key).compile().memory_analysis()
        total = (getattr(ma, "argument_size_in_bytes", 0)
                 + getattr(ma, "output_size_in_bytes", 0)
                 + getattr(ma, "temp_size_in_bytes", 0))
        rows.append((label, total))
        print(f"{label:52s} total/device={fmt(total)}", flush=True)

    full = (V, V, V)
    # whole-volume training (what the reference's fixed-size path would cost
    # at native resolution, batch 1 is usually all that fits)
    measure(f"whole-volume {V}^3, batch 1", full, 1, full, False)
    # patch training on the SAME full-resolution data
    for patch, batch in ((96, 4), (96, 8), (128, 4)):
        measure(
            f"patch {patch}^3 from {V}^3 volumes, batch {batch}",
            (patch,) * 3, batch, full, True,
        )
    # composed with gradient accumulation: effective batch 8 at the
    # activation memory of a 2-sample micro-batch
    measure(
        f"patch 96^3 from {V}^3 volumes, batch 8, grad_accum 4",
        (96,) * 3, 8, full, True, grad_accum=4,
    )

    base = rows[0][1]
    print(f"\nvolume {V}^3, width {args.width}, bf16 compute; "
          "vs whole-volume batch-1:")
    for label, total in rows:
        print(f"  {label:52s} {total / base:6.2f}x  ({fmt(total)})")


if __name__ == "__main__":
    main()

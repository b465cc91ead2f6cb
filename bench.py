"""Benchmark: SSD3D full-volume inference throughput (volumes/sec/chip).

Runs on the real TPU chip (axon). Measures end-to-end detection — bf16
backbone + heads + on-device decode/NMS/top-k — on 96^3 single-channel
volumes (BASELINE.json config #2), sweeping batch size for peak throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is against the driver's north-star target of 50 volumes/sec/chip
(BASELINE.md; the reference itself publishes no numbers).
"""

from __future__ import annotations

import json
import os
import time

import jax

# Persistent compilation cache: first-compile of the 96^3 tower through the
# axon remote-compile tunnel is minutes; repeat bench runs hit the cache.
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
os.makedirs(_CACHE_DIR, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from mslesions3d_tpu.models import SSD3D, SSD3DConfig, model_priors
from mslesions3d_tpu.ops.nms import detect_objects

TARGET_VOLUMES_PER_SEC = 50.0  # BASELINE.json north star (v5e)
VOLUME = (96, 96, 96)


def build(batch: int):
    config = SSD3DConfig.create(
        n_classes=2, input_channels=1, input_size=VOLUME, dtype="bfloat16",
        min_score=0.5, top_k=100,
    )
    model = SSD3D(config)
    priors = jnp.asarray(model_priors(config))
    images = jnp.zeros((batch, *VOLUME, 1), jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), images, train=False)

    @jax.jit
    def infer(variables, images):
        locs, scores = model.apply(variables, images, train=False)
        det = detect_objects(
            locs, scores, priors,
            n_classes=config.n_classes, min_score=config.min_score,
            max_overlap=config.max_overlap, top_k=config.top_k,
        )
        return det["count"]

    return infer, variables, images


def measure(batch: int, iters: int = 20) -> float:
    infer, variables, images = build(batch)
    infer(variables, images).block_until_ready()  # compile
    # warm
    for _ in range(3):
        out = infer(variables, images)
    out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = infer(variables, images)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    return batch * iters / dt


def main():
    best = 0.0
    best_batch = 0
    for batch in (1, 64, 128):
        try:
            vps = measure(batch)
        except Exception as e:  # OOM at large batch: keep the best so far
            print(f"# batch {batch} failed: {type(e).__name__}", flush=True)
            break
        print(f"# batch {batch}: {vps:.2f} volumes/sec", flush=True)
        if vps > best:
            best, best_batch = vps, batch

    print(json.dumps({
        "metric": "ssd3d_96cube_bf16_inference_throughput",
        "value": round(best, 3),
        "unit": "volumes/sec/chip",
        "vs_baseline": round(best / TARGET_VOLUMES_PER_SEC, 4),
        "detail": {"volume": list(VOLUME), "best_batch": best_batch,
                    "device": str(jax.devices()[0])},
    }))


if __name__ == "__main__":
    main()

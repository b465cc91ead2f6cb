"""Benchmark: SSD3D full-volume inference + training throughput.

Runs on the real TPU chip (axon). Measures:
  * end-to-end detection (bf16 backbone + heads + on-device decode/NMS/
    top-k) on 96^3 single-channel volumes (BASELINE.json config #2),
    sweeping batch size for peak throughput — the headline metric;
  * the full jitted TRAIN step (device augmentation + forward + MultiBox
    loss + backward + Adam update) at the reference training geometry
    (64^3, batch 8 and a throughput batch) — volumes/sec/chip, reported in
    the detail dict (round-1 verdict: the training path had no number).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is against the driver's north-star target of 50 volumes/sec/chip
(BASELINE.md; the reference itself publishes no numbers).
"""

from __future__ import annotations

import json
import time

import jax

import jax.numpy as jnp
import numpy as np

# Persistent compilation cache: first-compile of the 96^3 tower through the
# axon remote-compile tunnel is minutes; repeat bench runs hit the cache
# (keyed by backend runtime version — see utils/cache.py).
from mslesions3d_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

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


SW_VOLUME = (192, 224, 192)  # BASELINE.json config #3 full-volume geometry


def measure_sliding_window(iters: int = 20, volume_batch: int = 1) -> float:
    """Full-volume sliding-window detection (96^3 patches, on-device
    stitching) — the literal headline metric (BASELINE.json config #3).
    volume_batch > 1 = throughput mode: several volumes' patch grids share
    large device batches."""
    from mslesions3d_tpu.sliding_window import make_sliding_window_detector

    config = SSD3DConfig.create(
        n_classes=2, input_channels=1, input_size=VOLUME, dtype="bfloat16",
        min_score=0.5, top_k=100,
    )
    model = SSD3D(config)
    images = jnp.zeros((1, *VOLUME, 1), jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), images, train=False)
    detect = make_sliding_window_detector(
        config, SW_VOLUME, volume_batch=volume_batch
    )
    shape = (*SW_VOLUME, 1) if volume_batch == 1 else (volume_batch, *SW_VOLUME, 1)
    volume = jnp.zeros(shape, jnp.bfloat16)
    iters = max(iters // volume_batch, 5)
    np.asarray(detect(variables, volume)["count"])  # compile + real sync
    for _ in range(3):
        out = detect(variables, volume)
    np.asarray(out["count"])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = detect(variables, volume)
    np.asarray(out["count"])  # host readback: block_until_ready under-reports
    dt = time.perf_counter() - t0
    return volume_batch * iters / dt


TRAIN_VOLUME = (64, 64, 64)  # reference training geometry (train.py:30)


def build_train(batch: int):
    from mslesions3d_tpu.data.augment import AugmentConfig
    from mslesions3d_tpu.train import create_train_state, make_train_step

    config = SSD3DConfig.create(
        n_classes=2, input_channels=1, input_size=TRAIN_VOLUME,
        dtype="bfloat16", lr=1e-3, threshold=[0.1, 0.2], batch_size=batch,
    )
    model = SSD3D(config)
    priors = model_priors(config)
    state = create_train_state(model, config, jax.random.PRNGKey(0))
    augment = AugmentConfig(flip_axes=(0, 1, 2), rot90_planes=((1, 2),))
    step = make_train_step(config, model, priors, augment=augment, donate=True)

    rng = np.random.default_rng(0)
    d = TRAIN_VOLUME[0]
    batch_data = {
        "image": jnp.asarray(rng.normal(0, 1, (batch, d, d, d, 1)).astype(np.float32)),
        "boxes": jnp.tile(jnp.asarray([[0.2, 0.2, 0.2, 0.5, 0.5, 0.5],
                                        [0.6, 0.6, 0.6, 0.8, 0.8, 0.8]],
                                       jnp.float32), (batch, 1, 1)),
        "labels": jnp.ones((batch, 2), jnp.int32),
        "box_mask": jnp.ones((batch, 2), bool),
        "batch_mask": jnp.ones((batch,), bool),
    }
    return step, state, batch_data


def measure_train(batch: int, iters: int = 30) -> float:
    step, state, data = build_train(batch)
    key = jax.random.PRNGKey(0)
    state, m = step(state, data, key)  # compile
    for i in range(3):  # warm
        state, m = step(state, data, jax.random.fold_in(key, i))
    jax.block_until_ready(m["total_loss"])
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, data, jax.random.fold_in(key, 100 + i))
    jax.block_until_ready(m["total_loss"])
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

    extra = {}
    try:
        sw = measure_sliding_window()
        print(f"# sliding-window {SW_VOLUME}: {sw:.2f} volumes/sec", flush=True)
        extra["sliding_window_192x224x192_volumes_per_sec"] = round(sw, 3)
        sw16 = measure_sliding_window(volume_batch=16)
        print(f"# sliding-window {SW_VOLUME} x16 volumes: {sw16:.2f} volumes/sec",
              flush=True)
        extra["sliding_window_192x224x192_x16_volumes_per_sec"] = round(sw16, 3)
    except Exception as e:
        print(f"# sliding-window failed: {type(e).__name__}", flush=True)

    train = {}
    for batch in (8, 64):
        try:
            tvps = measure_train(batch)
        except Exception as e:
            print(f"# train batch {batch} failed: {type(e).__name__}", flush=True)
            break
        print(f"# train batch {batch}: {tvps:.2f} volumes/sec "
              f"({1000 * batch / tvps:.1f} ms/step)", flush=True)
        train[f"train_64cube_batch{batch}_volumes_per_sec"] = round(tvps, 3)

    print(json.dumps({
        "metric": "ssd3d_96cube_bf16_inference_throughput",
        "value": round(best, 3),
        "unit": "volumes/sec/chip",
        "vs_baseline": round(best / TARGET_VOLUMES_PER_SEC, 4),
        "detail": {"volume": list(VOLUME), "best_batch": best_batch,
                    "device": str(jax.devices()[0]), **extra, **train},
    }))


if __name__ == "__main__":
    main()

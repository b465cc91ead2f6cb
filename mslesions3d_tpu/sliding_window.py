"""Sliding-window full-volume inference with on-device patch stitching.

NEW capability (BASELINE.json config #3): the reference has no sliding window
— it resizes/crops every volume to a fixed size and runs it in one shot
(SURVEY.md §5, lesions3d/datasets.py:206). Here arbitrarily large volumes are
tiled into overlapping model-sized patches; every patch runs through the
detector in device-sized batches, per-patch detections are mapped to global
fractional coordinates, and a second-stage class-wise greedy NMS on device
stitches overlapping patches' detections into one result.

Everything after patch extraction is a single jit program per (volume shape,
patch grid) pair: patches are gathered with dynamic slices under vmap, so no
host round-trips happen between patches.
"""

from __future__ import annotations



import jax
import jax.numpy as jnp
import numpy as np

from .models.ssd3d import SSD3D, SSD3DConfig, model_priors
from .ops.nms import NEG_INF, detect_objects, greedy_nms


def patch_offsets(volume_shape, patch_size, overlap: float = 0.25):
    """Host-side grid of patch start offsets covering the volume.

    Stride = patch * (1 - overlap); the final patch per axis is clamped so
    the window never leaves the volume (full coverage, possibly more overlap
    at the far edge).
    """
    offsets = []
    per_axis = []
    for size, patch in zip(volume_shape, patch_size):
        if size < patch:
            raise ValueError(f"volume {volume_shape} smaller than patch {patch_size}")
        stride = max(int(round(patch * (1.0 - overlap))), 1)
        starts = list(range(0, size - patch + 1, stride))
        if starts[-1] != size - patch:
            starts.append(size - patch)
        per_axis.append(starts)
    for x in per_axis[0]:
        for y in per_axis[1]:
            for z in per_axis[2]:
                offsets.append((x, y, z))
    return np.asarray(offsets, np.int32)


def make_sliding_window_detector(
    config: SSD3DConfig,
    volume_shape: tuple[int, int, int],
    overlap: float = 0.25,
    patch_batch: int | None = None,
    min_score: float | None = None,
    max_overlap: float | None = None,
    top_k: int | None = None,
    per_patch_k: int | None = None,
    volume_batch: int = 1,
    mesh=None,
    stitch_impl: str = "auto",
    patch_forward=None,
):
    """Build fn(variables, volume (D,H,W,C)) -> stitched padded detections.

    Returns a host-callable that runs the jitted patch pipeline. Detections
    come back in GLOBAL fractional coordinates of the full volume.

    ``patch_batch`` defaults to the whole (padded) patch grid up to 32 —
    device batching is the main throughput lever (bench.py: batch 8 -> 128
    is ~2x on v5e), so small grids run as ONE device batch instead of
    several serialized chunks.

    ``per_patch_k`` caps detections kept per patch BEFORE stitching
    (default max(top_k // 2, 16)); a lesion-dense patch that saturates it
    silently loses detections, so raise it (up to top_k) when per-patch
    counts can approach the cap. The cap is announced at build time.

    ``volume_batch > 1`` builds the THROUGHPUT variant: fn takes volumes
    (V, D, H, W, C) and returns per-volume stitched detections with leading
    axis V. One volume's patch grid (27 patches at the headline geometry)
    underfills the chip — batching V volumes' grids into shared device
    batches recovers the large-batch inference rate (patch_batch then
    defaults to up to 128).

    ``mesh`` (a 1-D "data" jax mesh) builds the MULTI-CHIP variant: each
    device batch of patches is sharded over the mesh, so the patch grid of
    one (or volume_batch) volume(s) runs data-parallel across chips — the
    serving-scale path for full-volume inference on a pod slice. The
    stitching NMS batch shards the same way. Forward-only, so none of the
    partitioner gradient hazards apply (tools/xla_spmd_bug_repro.py);
    sharded == single-device is asserted by tests/test_sliding_window.py.
    """
    model = SSD3D(config)
    priors = jnp.asarray(model_priors(config))
    # patch_forward: optional (variables, patches) -> (locs, scores) override
    # of the standard model forward — e.g. the int8-quantized program
    # (quant.quantized_forward with baked weights) for quantized full-volume
    # serving bundles.
    if patch_forward is None:
        patch_forward = lambda v, p: model.apply(v, p, train=False)
    patch = config.input_size
    offsets = patch_offsets(volume_shape, patch, overlap)
    n_patches = offsets.shape[0]
    n_volumes = int(volume_batch)
    total = n_volumes * n_patches
    n_shards = 1
    if mesh is not None:
        n_shards = int(np.prod(list(mesh.shape.values())))
    if patch_batch is None:
        patch_batch = min(-(-total // 8) * 8, 32 if n_volumes == 1 else 128)
        patch_batch = -(-patch_batch // n_shards) * n_shards
    if patch_batch % n_shards:
        raise ValueError(
            f"patch_batch={patch_batch} not divisible by the mesh's "
            f"{n_shards} devices"
        )
    # flat (volume, offset) work list, padded to a multiple of the device batch
    n_padded = -(-total // patch_batch) * patch_batch
    vol_idx_flat = np.concatenate(
        [np.repeat(np.arange(n_volumes, dtype=np.int32), n_patches),
         np.zeros(n_padded - total, np.int32)]
    )
    offsets_padded = np.concatenate(
        [np.tile(offsets, (n_volumes, 1)),
         np.repeat(offsets[-1:], n_padded - total, axis=0)], axis=0
    )
    patch_valid = np.arange(n_padded) < total

    min_score = config.min_score if min_score is None else min_score
    max_overlap = config.max_overlap if max_overlap is None else max_overlap
    top_k = config.top_k if top_k is None else top_k
    if per_patch_k is None:
        per_patch_k = max(top_k // 2, 16)
    print(
        f"[sliding_window] {n_patches} patches of {tuple(patch)} over "
        f"{tuple(volume_shape)}; keeping <= {per_patch_k} detections/patch "
        f"before stitching (pass per_patch_k to raise)",
        flush=True,
    )

    vol_size = jnp.asarray(volume_shape, jnp.float32)
    patch_size = jnp.asarray(patch, jnp.float32)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as _P

        axis0 = mesh.axis_names[0]
        _patch_sharding = NamedSharding(mesh, _P(axis0))

        def shard_patches(x):
            return jax.lax.with_sharding_constraint(x, _patch_sharding)
    else:
        def shard_patches(x):
            return x

    @jax.jit
    def run(variables, volume):
        volumes = volume[None] if volume.ndim == 4 else volume  # (V, D, H, W, C)
        offs = jnp.asarray(offsets_padded)
        vidx = jnp.asarray(vol_idx_flat)
        valid = jnp.asarray(patch_valid)

        def extract(vi, off):
            return jax.lax.dynamic_slice(
                volumes, (vi, off[0], off[1], off[2], 0),
                (1, *patch, volumes.shape[-1]),
            )[0]

        def process_chunk(carry, idx):
            chunk_offs = jax.lax.dynamic_slice_in_dim(offs, idx * patch_batch, patch_batch)
            chunk_vidx = jax.lax.dynamic_slice_in_dim(vidx, idx * patch_batch, patch_batch)
            chunk_valid = jax.lax.dynamic_slice_in_dim(valid, idx * patch_batch, patch_batch)
            patches = shard_patches(jax.vmap(extract)(chunk_vidx, chunk_offs))
            locs, scores = patch_forward(variables, patches)
            det = detect_objects(
                locs, scores, priors,
                n_classes=config.n_classes, min_score=min_score,
                max_overlap=max_overlap, top_k=per_patch_k,
            )
            # map to global fractional coordinates
            off_frac = chunk_offs.astype(jnp.float32) / vol_size  # (B, 3)
            scale = patch_size / vol_size  # (3,)
            lo = det["boxes"][..., :3] * scale + off_frac[:, None, :]
            hi = det["boxes"][..., 3:] * scale + off_frac[:, None, :]
            # clip to the volume (the reference clips at save time,
            # predict.py:195)
            boxes = jnp.clip(jnp.concatenate([lo, hi], axis=-1), 0.0, 1.0)
            det_valid = (
                (jnp.arange(det["scores"].shape[-1])[None, :] < det["count"][:, None])
                & chunk_valid[:, None]
            )
            scores_out = jnp.where(det_valid, det["scores"], 0.0)
            labels_out = jnp.where(det_valid, det["labels"], 0)
            return carry, (boxes, labels_out, scores_out)

        n_chunks = n_padded // patch_batch
        _, (boxes, labels, scores) = jax.lax.scan(
            process_chunk, None, jnp.arange(n_chunks)
        )
        # (chunks, B, K, ...) -> drop grid padding -> (V, per-volume cands, ...)
        k_slots = boxes.shape[2]  # detect_objects may return < per_patch_k
        per_vol = n_patches * k_slots
        boxes = boxes.reshape(-1, 6)[: total * k_slots].reshape(n_volumes, per_vol, 6)
        labels = labels.reshape(-1)[: total * k_slots].reshape(n_volumes, per_vol)
        scores = scores.reshape(-1)[: total * k_slots].reshape(n_volumes, per_vol)

        # second-stage class-wise NMS to merge duplicate detections from
        # overlapping patches — (volume, class) candidate sets flattened into
        # one batch so the fused Pallas kernel (TPU) serves the stitch too;
        # XLA fixpoint elsewhere
        cm = config.n_classes - 1
        cls_range = jnp.arange(1, config.n_classes)
        k = min(10 * top_k, per_vol)

        def gather_vol_class(v_scores, v_labels, v_boxes):
            def gather_class(c):
                c_scores = jnp.where(v_labels == c, v_scores, 0.0)
                cand_scores, cand_idx = jax.lax.top_k(c_scores, k)
                return v_boxes[cand_idx], cand_scores

            return jax.vmap(gather_class)(cls_range)  # (Cm, k, ...)

        cls_boxes, cand_scores = jax.vmap(gather_vol_class)(scores, labels, boxes)
        cls_boxes = cls_boxes.reshape(n_volumes * cm, k, 6)
        cand_scores = cand_scores.reshape(n_volumes * cm, k)
        if mesh is not None and (n_volumes * cm) % n_shards == 0:
            # stitch NMS rides the mesh too when its batch divides
            cls_boxes = shard_patches(cls_boxes)
            cand_scores = shard_patches(cand_scores)
        cand_valid = cand_scores > min_score
        # "auto" picks the fused Pallas kernel on TPU; serving export forces
        # "xla" so multi-platform bundles lower everywhere
        if stitch_impl == "pallas" or (
            stitch_impl == "auto" and jax.default_backend() == "tpu"
        ):
            from .kernels.nms import greedy_nms_pallas

            keep = greedy_nms_pallas(cls_boxes, cand_valid, float(max_overlap))
        else:
            keep = jax.vmap(lambda bx, v: greedy_nms(bx, v, max_overlap))(
                cls_boxes, cand_valid
            )
        kept_scores = jnp.where(keep, cand_scores, NEG_INF)

        # per volume: global top-k across classes
        cls_labels = jnp.broadcast_to(
            cls_range[None, :, None], (n_volumes, cm, k)
        )
        flat_scores = kept_scores.reshape(n_volumes, cm * k)
        flat_boxes = cls_boxes.reshape(n_volumes, cm * k, 6)
        flat_labels = cls_labels.reshape(n_volumes, cm * k)
        best_scores, best_idx = jax.lax.top_k(flat_scores, min(top_k, cm * k))
        sel = best_scores > NEG_INF / 2
        picked_boxes = jnp.take_along_axis(flat_boxes, best_idx[..., None], axis=1)
        picked_labels = jnp.take_along_axis(flat_labels, best_idx, axis=1)
        return {
            "boxes": jnp.where(sel[..., None], picked_boxes, 0.0),
            "labels": jnp.where(sel, picked_labels, 0),
            "scores": jnp.where(sel, best_scores, 0.0),
            "count": sel.sum(-1),
        }

    run.n_patches = n_patches
    run.volume_batch = n_volumes
    return run

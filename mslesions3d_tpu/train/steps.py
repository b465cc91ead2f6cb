"""jitted train / eval / predict steps.

Each step is one global-view XLA program: device-side augmentation, forward,
loss, backward, and the optimizer update fuse into a single compilation.
Under a data mesh (parallel/mesh.py) the same functions run data-parallel —
batches arrive batch-sharded, parameters replicated, and XLA emits the
gradient all-reduce over ICI.

Replaces the Lightning hooks (lesions3d/ssd3d.py:467-722): training_step/
validation_step/predict_step + configure_optimizers' per-step scheduler.
"""

from __future__ import annotations



import jax
import jax.numpy as jnp

from ..data.augment import AugmentConfig, augment_batch
from ..models.losses import multibox_loss_from_config
from ..models.ssd3d import SSD3D, SSD3DConfig
from ..ops.nms import detect_objects


def _model_sharding_ctx(constraint_mesh):
    """Context installing the spatial-activation constraint interceptor.

    Required for CORRECTNESS whenever batches arrive volume-depth-sharded:
    without it XLA's partitioner miscompiles the deep backbone's backward
    pass (see parallel/spatial.py::spatial_activation_interceptor). No-op
    when ``constraint_mesh`` is None.
    """
    from contextlib import nullcontext

    if constraint_mesh is None:
        return nullcontext()
    from flax import linen as nn

    from ..parallel.spatial import spatial_activation_interceptor

    return nn.intercept_methods(spatial_activation_interceptor(constraint_mesh))


def make_train_step(config: SSD3DConfig, model: SSD3D, priors_center,
                    augment: AugmentConfig | None = None,
                    hard_negative_mining: bool = False, donate: bool = True,
                    skip_nonfinite: bool = True, with_detections: bool = False,
                    return_grads: bool = False, jit: bool = True,
                    constraint_mesh=None, patch_training: bool = False,
                    patch_pos_fraction: float = 0.7, grad_accum: int = 1):
    """Returns jitted fn(state, batch, rng) -> (state, metrics).

    Failure detection (SURVEY.md §5: the reference's only failure handling is
    NaN guards that raise and kill the run, ssd3d.py:258-261, 938-940): with
    ``skip_nonfinite`` a non-finite loss skips the parameter/optimizer update
    for that step and reports metrics["nonfinite"]=1. The consecutive-streak
    counter lives in TrainState (on device) and is mirrored into
    metrics["nonfinite_streak"], so the trainer only inspects it on the
    logging cadence instead of forcing a device sync every step.

    ``with_detections`` additionally runs decode+NMS on the TRAINING
    forward's outputs and returns the augmented GT alongside — the
    reference computes train-epoch mAP from the training forward
    (ssd3d.py:499-518), not from a second eval forward. ``return_grads``
    returns the raw gradient tree (for the every-25-steps TB histograms,
    ssd3d.py:729-738). Both add outputs, so they are built as a separate
    compiled variant used only on metric/histogram steps.

    ``grad_accum > 1`` splits the batch into that many micro-batches and
    runs them as a lax.scan, averaging gradients before ONE optimizer
    update — activation memory drops to one micro-batch's worth, so large
    patches/volumes can train at effective batch sizes that do not fit
    HBM. Standard grad-accum semantics: BatchNorm statistics and the
    MultiBox positives normalization are per-micro-batch (exactly
    equivalent to the unaccumulated step when positives are evenly
    distributed; tested).
    """
    priors_center = jnp.asarray(priors_center)
    augment = augment or AugmentConfig()

    def step(state, batch, rng):
        images = batch["image"]
        boxes = batch["boxes"]
        labels = batch["labels"]
        box_mask = batch["box_mask"]

        if patch_training:
            # device-side lesion-biased random patch crop (data/patches.py):
            # batches carry FULL-resolution volumes; each step trains on a
            # fresh config.input_size crop per sample. Every step variant
            # (gathered, epoch-scan, data-parallel) inherits this because
            # they all compose this body.
            from ..data.patches import (
                boxes_to_patch, crop_patches, sample_patch_starts,
            )

            full_shape = images.shape[1:4]
            patch = tuple(config.input_size)
            starts = sample_patch_starts(
                jax.random.fold_in(rng, 2), full_shape, patch,
                boxes, box_mask, patch_pos_fraction,
            )
            images = crop_patches(images, starts, patch)
            boxes, box_mask = boxes_to_patch(
                boxes, box_mask, starts, full_shape, patch
            )

        if not augment.identity:
            images, boxes = augment_batch(rng, images, boxes, augment)
            # augmentation can push boxes out of range; clamp like the
            # reference's prior clamp and keep degenerate ones masked out
            boxes = jnp.clip(boxes, 0.0, 1.0)
            degenerate = jnp.any(boxes[..., 3:] <= boxes[..., :3], axis=-1)
            box_mask = box_mask & ~degenerate
            if constraint_mesh is not None:
                # pin the augmented image back to the canonical
                # (data, spatial) layout: the flip resample contracts over
                # the sharded depth axis, and left to itself the
                # partitioner's layout choice for that contraction puts the
                # following conv chain's BACKWARD in the same miscompiled
                # regime as bug A (whole grad leaves x2 at n_spatial=2,
                # forward exact; tools/xla_spmd_bug_repro.py bug C)
                from jax.sharding import NamedSharding, PartitionSpec as P

                images = jax.lax.with_sharding_constraint(
                    images,
                    NamedSharding(constraint_mesh, P("data", "spatial")),
                )

        def loss_fn(params, stats, mb, dropout_key):
            with _model_sharding_ctx(constraint_mesh):
                (locs, scores), mutated = model.apply(
                    {"params": params, "batch_stats": stats},
                    mb["image"], train=True,
                    mutable=["batch_stats"],
                    rngs={"dropout": dropout_key},
                )
            conf_loss, loc_loss = multibox_loss_from_config(
                config, locs, scores, mb["boxes"], mb["labels"],
                mb["box_mask"], priors_center, batch_mask=mb["batch_mask"],
                hard_negative_mining=hard_negative_mining,
            )
            total = conf_loss + config.alpha * loc_loss
            # unfreeze: for a BN-less model (convnet backbone) flax hands
            # back FrozenDict({}) where the state holds a plain dict, and
            # the skip_nonfinite tree merge below needs matching structures
            from flax.core import unfreeze

            return total, (conf_loss, loc_loss, unfreeze(mutated["batch_stats"]),
                           locs, scores)

        mb_full = {
            "image": images, "boxes": boxes, "labels": labels,
            "box_mask": box_mask,
            "batch_mask": batch.get(
                "batch_mask", jnp.ones(images.shape[0], bool)
            ),
        }
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        dropout_key = jax.random.fold_in(rng, 1)
        if grad_accum <= 1:
            (total, (conf_loss, loc_loss, new_stats, locs, scores)), grads = (
                grad_fn(state.params, state.batch_stats, mb_full, dropout_key)
            )
        else:
            B = images.shape[0]
            if B % grad_accum:
                raise ValueError(
                    f"batch size {B} is not divisible by grad_accum={grad_accum}"
                )
            micro = {
                k: v.reshape(grad_accum, B // grad_accum, *v.shape[1:])
                for k, v in mb_full.items()
            }

            def pin_micro(mb):
                # under a spatial mesh the scan's micro-slices need their
                # layouts pinned: left to the partitioner, a micro batch
                # smaller than the mesh lands in the padded-partition regime
                # whose backward is miscompiled (parallel/spatial.py)
                if constraint_mesh is None:
                    return mb
                from jax.sharding import NamedSharding, PartitionSpec as P

                n_data = dict(constraint_mesh.shape).get("data", 1)
                b = mb["image"].shape[0]
                data_ax = "data" if (n_data > 1 and b % n_data == 0) else None
                img = NamedSharding(constraint_mesh, P(data_ax, "spatial"))
                row = NamedSharding(constraint_mesh, P(data_ax))
                return {
                    k: jax.lax.with_sharding_constraint(
                        v, img if getattr(v, "ndim", 0) >= 5 else row)
                    for k, v in mb.items()
                }

            def accum_body(carry, mb_i):
                mb, i = mb_i
                gsum, stats = carry
                # per-micro-batch dropout key: identical keys would give all
                # micro-batches the same per-position dropout mask, reducing
                # dropout diversity across the effective batch
                (t, (c, l, new_stats, locs, scores)), g = grad_fn(
                    state.params, stats, pin_micro(mb),
                    jax.random.fold_in(dropout_key, i),
                )
                gsum = jax.tree_util.tree_map(jnp.add, gsum, g)
                # BN running stats chain micro-batch to micro-batch
                return (gsum, new_stats), (t, c, l, locs, scores)

            zero = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (gsum, new_stats), (ts, cs, ls, locs_s, scores_s) = jax.lax.scan(
                accum_body, (zero, state.batch_stats),
                (micro, jnp.arange(grad_accum)),
            )
            grads = jax.tree_util.tree_map(lambda g: g / grad_accum, gsum)
            total, conf_loss, loc_loss = ts.mean(), cs.mean(), ls.mean()
            locs = locs_s.reshape(B, *locs_s.shape[2:])
            scores = scores_s.reshape(B, *scores_s.shape[2:])
        updated = state.apply_gradients(grads, new_batch_stats=new_stats)
        ema_decay = float(getattr(config, "ema_decay", 0.0))
        if ema_decay > 0.0 and state.ema_params is not None:
            # EMA rides inside `updated`, so the non-finite merge below keeps
            # the old average whenever the parameter update itself is skipped
            updated = updated.replace(
                ema_params=jax.tree_util.tree_map(
                    lambda e, p: e * ema_decay + p.astype(e.dtype) * (1.0 - ema_decay),
                    state.ema_params, updated.params,
                )
            )
        if skip_nonfinite:
            finite = jnp.isfinite(total)
            new_state = jax.tree_util.tree_map(
                lambda new, old: jnp.where(finite, new, old)
                if hasattr(new, "dtype") else new,
                updated,
                state.replace(step=state.step + 1),
            )
        else:
            finite = jnp.asarray(True)
            new_state = updated
        new_state = new_state.replace(
            nonfinite_streak=jnp.where(
                finite, 0, state.nonfinite_streak + 1
            ).astype(jnp.int32)
        )
        # global gradient norm: the per-step observability analog of the
        # reference's every-25-steps gradient histograms (ssd3d.py:729-738)
        grad_norm = jnp.sqrt(
            sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                for g in jax.tree_util.tree_leaves(grads))
        )
        metrics = {
            "total_loss": total,
            "conf_loss": conf_loss,
            "loc_loss": loc_loss,
            "n_positives": (box_mask.sum()).astype(jnp.float32),
            "nonfinite": (~finite).astype(jnp.float32),
            "nonfinite_streak": new_state.nonfinite_streak,
            "grad_norm": grad_norm,
        }
        if with_detections:
            metrics["detections"] = detect_objects(
                locs, scores, priors_center,
                n_classes=config.n_classes, min_score=config.min_score,
                max_overlap=config.max_overlap, top_k=config.top_k,
            )
            # GT as the model saw it (post-augmentation) — the reference's
            # train-metric GT is the augmented dataloader output
            metrics["aug_boxes"] = boxes
            metrics["aug_labels"] = labels
            metrics["aug_box_mask"] = box_mask
        if return_grads:
            metrics["grads"] = grads
        return new_state, metrics

    if not jit:  # raw body, for composition (e.g. device-gathered batches)
        return step
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def _gather_rows(data: dict, idx) -> dict:
    """Row gather from a device-resident dataset via scan + dynamic_slice.

    Deliberately NOT jnp.take: measured on TPU v5e, a take/gather of
    (B, 64^3) rows fused into the training program runs ~185 ms/step (XLA
    lowers the big-slice gather badly in context), while the same gather as
    a scan of dynamic slices — or in its own jit, or as a one-hot matmul —
    is ~0.02 ms. dynamic_slice also clamps out-of-range starts, giving
    mode="clip" semantics for padded eval indices for free.
    """

    def one(_, j):
        return None, {
            k: jax.lax.dynamic_index_in_dim(v, j, axis=0, keepdims=False)
            for k, v in data.items()
        }

    _, batch = jax.lax.scan(one, None, idx)
    return batch


def make_gathered_train_step(config: SSD3DConfig, model: SSD3D, priors_center,
                             augment: AugmentConfig | None = None, **kwargs):
    """Train step over a DEVICE-RESIDENT dataset: fn(state, data, idx, rng).

    ``data`` is the materialized dataset (datasets.materialize) living in
    HBM; ``idx`` (B,) selects the batch with an on-device gather, so the
    host sends a handful of int32s per step instead of megabytes of volumes
    — the difference between transfer-bound and compute-bound training on a
    tunneled/remote TPU. All make_train_step options pass through.
    """
    body = make_train_step(config, model, priors_center, augment,
                           jit=False, **{**kwargs, "donate": False})
    donate = kwargs.get("donate", True)

    def step(state, data, idx, rng):
        batch = _gather_rows(data, idx)
        batch["batch_mask"] = jnp.ones(idx.shape, bool)
        return body(state, batch, rng)

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_gathered_train_epoch(config: SSD3DConfig, model: SSD3D, priors_center,
                              augment: AugmentConfig | None = None, **kwargs):
    """Whole-epoch train program: fn(state, data, idx_matrix, epoch_rng).

    ``idx_matrix`` (n_batches, B) int32 selects every batch of the epoch;
    lax.scan runs them back-to-back ON DEVICE. On a tunneled TPU the
    per-step host work of the python loop (rng op + index upload + dispatch
    round trip) costs several times the ~6 ms step itself — one dispatch per
    EPOCH removes it. Per-step keys are fold_in(epoch_rng, state.step),
    matching the python loop's key derivation exactly, so scanned and
    stepped epochs are numerically identical (tested). Returns
    (final state, stacked per-batch metrics (n_batches, ...)) — losses come
    back as one bulk transfer for epoch-end logging.
    """
    body = make_train_step(config, model, priors_center, augment,
                           jit=False, **{**kwargs, "donate": False})
    donate = kwargs.get("donate", True)

    def epoch(state, data, idx_matrix, epoch_rng):
        def scan_body(st, idx):
            key = jax.random.fold_in(epoch_rng, st.step)
            batch = _gather_rows(data, idx)
            batch["batch_mask"] = jnp.ones(idx.shape, bool)
            st2, m = body(st, batch, key)
            keep = {k: m[k] for k in ("total_loss", "conf_loss", "loc_loss",
                                       "grad_norm", "nonfinite_streak")}
            return st2, keep

        return jax.lax.scan(scan_body, state, idx_matrix)

    return jax.jit(epoch, donate_argnums=(0,) if donate else ())


def make_eval_step(config: SSD3DConfig, model: SSD3D, priors_center,
                   with_detections: bool = True,
                   hard_negative_mining: bool = False, jit: bool = True,
                   constraint_mesh=None, patch_training: bool = False):
    """Returns jitted fn(state, batch) -> metrics (+ padded detections).

    ``hard_negative_mining`` must match the training flag: otherwise the
    monitored validation loss is a different objective than the one being
    optimized and checkpoint selection picks the wrong epochs.
    ``patch_training`` evaluates on a DETERMINISTIC lesion-centered crop of
    each full-resolution volume (data/patches.py) so the monitored val loss
    is reproducible across epochs.
    """
    priors_center = jnp.asarray(priors_center)

    def step(state, batch):
        images = batch["image"]
        boxes = batch["boxes"]
        labels = batch["labels"]
        box_mask = batch["box_mask"]
        if patch_training:
            from ..data.patches import (
                boxes_to_patch, crop_patches, deterministic_patch_starts,
            )

            full_shape = images.shape[1:4]
            patch = tuple(config.input_size)
            starts = deterministic_patch_starts(full_shape, patch, boxes, box_mask)
            images = crop_patches(images, starts, patch)
            boxes, box_mask = boxes_to_patch(
                boxes, box_mask, starts, full_shape, patch
            )
        with _model_sharding_ctx(constraint_mesh):
            (locs, scores) = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                images, train=False,
            )
        conf_loss, loc_loss = multibox_loss_from_config(
            config, locs, scores, boxes, labels,
            box_mask, priors_center, batch_mask=batch["batch_mask"],
            hard_negative_mining=hard_negative_mining,
        )
        out = {
            "total_loss": conf_loss + config.alpha * loc_loss,
            "conf_loss": conf_loss,
            "loc_loss": loc_loss,
            # real (unpadded) sample count — partial final batches must be
            # weighted by it when averaging epoch losses, or avg_val_loss is
            # biased and checkpoint selection on small val sets follows it
            "n_valid": batch["batch_mask"].sum().astype(jnp.float32),
        }
        if with_detections:
            out["detections"] = detect_objects(
                locs, scores, priors_center,
                n_classes=config.n_classes,
                min_score=config.min_score,
                max_overlap=config.max_overlap,
                top_k=config.top_k,
            )
            if patch_training:
                # detections live in the PATCH frame — hand back the
                # remapped GT so the trainer scores like against like
                out["gt_boxes"] = boxes
                out["gt_labels"] = labels
                out["gt_box_mask"] = box_mask
        return out

    if not jit:
        return step
    return jax.jit(step)


def make_sharded_gathered_train_step(config: SSD3DConfig, model: SSD3D,
                                     priors_center, mesh,
                                     augment: AugmentConfig | None = None,
                                     axis_name: str = "data", **kwargs):
    """Data-parallel train step over a SHARDED device-resident dataset.

    Scaling story: ``data`` is the materialized dataset device_put with
    NamedSharding(mesh, P(axis_name)) on the subject axis — every chip keeps
    only its shard in HBM and never streams volumes from the host. ``idx``
    (n_devices * B_local,) is P(axis_name)-sharded too; block d holds indices
    LOCAL to shard d (standard sharded-dataset sampling: each replica
    shuffles its own shard). The gather runs inside shard_map, so it touches
    no interconnect; the loss/grad body stays a global-view program and XLA
    emits the gradient all-reduce over ICI as usual.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    body = make_train_step(config, model, priors_center, augment,
                           jit=False, **{**kwargs, "donate": False})
    donate = kwargs.get("donate", True)

    gather_local = shard_map(
        _gather_rows, mesh=mesh,
        in_specs=(P(axis_name), P(axis_name)), out_specs=P(axis_name),
    )

    def step(state, data, idx, rng):
        batch = gather_local(data, idx)
        batch["batch_mask"] = jnp.ones(idx.shape, bool)
        return body(state, batch, rng)

    fn = jax.jit(step, donate_argnums=(0,) if donate else ())
    if kwargs.get("patch_training"):
        # bug D (BUGS.md): the PATCH-TRAINING variant of this program
        # deserializes corruptly from the persistent cache on the
        # forced-8-device CPU backend (5/6 warm runs abort) — always compile
        # it fresh there (no-op on TPU). Susceptibility is content-specific:
        # the non-patch variants deserialize cleanly (measured 14/14 and 6/6
        # consecutive warm runs with the quarantine disabled), so they keep
        # the cache; tests/test_bugd_canary.py guards the susceptible one.
        from ..utils.cache import quarantine_from_persistent_cache

        fn = quarantine_from_persistent_cache(fn)
    return fn


def make_gathered_eval_step(config: SSD3DConfig, model: SSD3D, priors_center,
                            **kwargs):
    """Eval step over a device-resident dataset: fn(state, data, idx, valid).

    ``valid`` (B,) masks padded rows of the final partial batch (gathers
    clamp out-of-range indices, so padding reuses row 0 and is masked out of
    every loss/metric downstream).
    """
    body = make_eval_step(config, model, priors_center, jit=False, **kwargs)

    def step(state, data, idx, valid):
        batch = _gather_rows(data, idx)
        batch["batch_mask"] = valid
        batch["box_mask"] = batch["box_mask"] & valid[:, None]
        return body(state, batch)

    return jax.jit(step)


def make_predict_step(config: SSD3DConfig, model: SSD3D, priors_center,
                      min_score=None, max_overlap=None, top_k=None):
    """Returns jitted fn(state, images) -> padded detections (ssd3d.py:692-702)."""
    priors_center = jnp.asarray(priors_center)

    def step(state, images):
        locs, scores = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            images, train=False,
        )
        return detect_objects(
            locs, scores, priors_center,
            n_classes=config.n_classes,
            min_score=config.min_score if min_score is None else min_score,
            max_overlap=config.max_overlap if max_overlap is None else max_overlap,
            top_k=config.top_k if top_k is None else top_k,
        )

    return jax.jit(step)

"""MultiBox prior <-> ground-truth matching as a static-shape vectorized op.

The reference implements matching with a per-image Python loop and chunked
(100-object) IoU to bound GPU memory (reference: lesions3d/ssd3d.py:775-888).
On TPU the full (n_objects, n_priors) IoU easily fits in VMEM/HBM at these
sizes, so the op is a single vmapped tensor program over a padded GT layout:

    gt_boxes  (B, M, 6)  corner-form fractional, padded with zeros
    gt_labels (B, M)     int class ids, padded with 0
    gt_mask   (B, M)     True for real objects

Semantics reproduced exactly (ssd3d.py:851-888):
  1. per prior, the max-overlap object (argmax over objects);
  2. per object, the max-overlap prior;
  3. force-assign each object to its best prior with overlap := 1
     (on collisions the highest object index wins, matching torch scatter);
  4. hard threshold: overlap < t  -> background(0);
     soft thresholds [lo, hi): overlap < lo -> 0, [lo, hi) -> ignore(-1).

Returns encoded regression targets for every prior plus per-prior class
targets (-1 = ignore).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .boxes import corner_to_center, encode_boxes, pairwise_iou

IGNORE_LABEL = -1


@partial(jax.jit, static_argnames=("soft",))
def match_priors_single(
    gt_boxes: jnp.ndarray,  # (M, 6) corner form, padded
    gt_labels: jnp.ndarray,  # (M,) int, padded with 0
    gt_mask: jnp.ndarray,  # (M,) bool
    priors_corner: jnp.ndarray,  # (P, 6)
    priors_center: jnp.ndarray,  # (P, 6)
    threshold_lo: float | jnp.ndarray,
    threshold_hi: float | jnp.ndarray = 0.0,
    soft: bool = False,
):
    """Match priors to GT for one image. Returns (loc_targets (P,6), cls_targets (P,))."""
    num_objects, num_priors = gt_boxes.shape[0], priors_corner.shape[0]

    overlap = pairwise_iou(gt_boxes, priors_corner)  # (M, P)
    overlap = jnp.where(gt_mask[:, None], overlap, -1.0)

    # Best object per prior / best prior per object.
    object_for_prior = jnp.argmax(overlap, axis=0)  # (P,)
    overlap_for_prior = jnp.max(overlap, axis=0)  # (P,)
    prior_for_object = jnp.argmax(overlap, axis=1)  # (M,)

    # Force-assign each valid object to its best prior. Emulates the torch
    # scatter (last/highest object index wins on duplicate priors,
    # ssd3d.py:864-868) with a deterministic masked max.
    forced = (prior_for_object[:, None] == jnp.arange(num_priors)[None, :]) & gt_mask[:, None]
    forced_object = jnp.max(
        jnp.where(forced, jnp.arange(num_objects)[:, None], -1), axis=0
    )  # (P,)
    is_forced = forced_object >= 0
    object_for_prior = jnp.where(is_forced, forced_object, object_for_prior)
    overlap_for_prior = jnp.where(is_forced, 1.0, overlap_for_prior)

    label_for_prior = gt_labels[object_for_prior]
    if soft:
        label_for_prior = jnp.where(overlap_for_prior < threshold_lo, 0, label_for_prior)
        in_ignore_band = (overlap_for_prior >= threshold_lo) & (overlap_for_prior < threshold_hi)
        label_for_prior = jnp.where(in_ignore_band, IGNORE_LABEL, label_for_prior)
    else:
        label_for_prior = jnp.where(overlap_for_prior < threshold_lo, 0, label_for_prior)

    # Encode matched boxes w.r.t. priors. Padded (zero-size) boxes would put
    # -inf through the log; they can only be gathered when no object is valid,
    # in which case everything is masked out below.
    matched = gt_boxes[object_for_prior]  # (P, 6)
    safe_matched = jnp.where(gt_mask[object_for_prior, None], matched, priors_corner)
    loc_targets = encode_boxes(corner_to_center(safe_matched), priors_center)

    any_valid = jnp.any(gt_mask)
    # Reference skips images with zero objects entirely (targets stay zero,
    # labels stay background; ssd3d.py:854-855).
    loc_targets = jnp.where(any_valid, loc_targets, 0.0)
    cls_targets = jnp.where(any_valid, label_for_prior, 0)
    return loc_targets, cls_targets


@partial(jax.jit, static_argnames=("soft",))
def match_priors_batch(
    gt_boxes: jnp.ndarray,  # (B, M, 6)
    gt_labels: jnp.ndarray,  # (B, M)
    gt_mask: jnp.ndarray,  # (B, M)
    priors_corner: jnp.ndarray,  # (P, 6)
    priors_center: jnp.ndarray,  # (P, 6)
    threshold_lo,
    threshold_hi=0.0,
    soft: bool = False,
):
    """vmap of :func:`match_priors_single` over the batch axis."""
    return jax.vmap(
        lambda b, l, m: match_priors_single(
            b, l, m, priors_corner, priors_center, threshold_lo, threshold_hi, soft=soft
        )
    )(gt_boxes, gt_labels, gt_mask)

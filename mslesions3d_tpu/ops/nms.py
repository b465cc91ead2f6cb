"""On-device box decode + greedy 3D NMS with static shapes.

The reference runs a per-image, per-class Python loop with boolean indexing
and dynamic shapes (lesions3d/ssd3d.py:344-460). Under XLA everything must be
static, so the pipeline becomes:

  softmax -> decode -> per class: top-K candidate gather (K = min(10*top_k,
  n_priors)) -> (K, K) IoU -> fixed-length greedy suppression loop
  (lax.fori_loop) -> global masked top-k across classes.

Outputs are padded to ``top_k`` with a validity mask; hosts needing the
reference's ragged lists + background placeholder use
:func:`detections_to_lists`.

Greedy order parity: candidates are visited in strictly decreasing score
order and a box suppresses every *other* box with IoU > max_overlap, exactly
as the reference's sequential loop (ssd3d.py:413-426).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .boxes import center_to_corner, decode_boxes, pairwise_iou

NEG_INF = -1e30


def greedy_nms(boxes_corner: jnp.ndarray, valid: jnp.ndarray, max_overlap) -> jnp.ndarray:
    """Greedy NMS over K score-sorted candidates; returns keep mask (K,).

    boxes_corner: (K, 6) sorted by decreasing score; valid: (K,) bool.
    """
    k = boxes_corner.shape[0]
    iou = pairwise_iou(boxes_corner, boxes_corner)  # (K, K)

    def body(i, suppress):
        row = (iou[i] > max_overlap) & valid[i] & ~suppress[i]
        new = jnp.where(row, True, suppress)
        return new.at[i].set(suppress[i])

    suppress = jax.lax.fori_loop(0, k, body, jnp.zeros((k,), dtype=bool))
    return valid & ~suppress


@partial(jax.jit, static_argnames=("n_classes", "top_k"))
def detect_objects(
    predicted_locs: jnp.ndarray,  # (B, P, 6)
    predicted_scores: jnp.ndarray,  # (B, P, n_classes) raw logits
    priors_center: jnp.ndarray,  # (P, 6)
    *,
    n_classes: int,
    min_score,
    max_overlap,
    top_k: int,
):
    """Batched decode + per-class NMS + global top-k, fully on device.

    Returns dict with
      boxes  (B, top_k, 6) corner form (padding zeros)
      labels (B, top_k) int (padding 0)
      scores (B, top_k) float (padding 0)
      count  (B,) number of valid detections
    """
    num_priors = predicted_locs.shape[1]
    k = min(10 * top_k, num_priors)

    probs = jax.nn.softmax(predicted_scores.astype(jnp.float32), axis=-1)  # (B, P, C)

    def per_image(locs, scores):
        decoded = center_to_corner(decode_boxes(locs.astype(jnp.float32), priors_center))

        def per_class(class_scores):
            cand_scores, cand_idx = jax.lax.top_k(class_scores, k)
            cand_boxes = decoded[cand_idx]
            cand_valid = cand_scores > min_score
            keep = greedy_nms(cand_boxes, cand_valid, max_overlap)
            return cand_boxes, jnp.where(keep, cand_scores, NEG_INF)

        # Classes 1..C-1 (skip background). C is static.
        cls_boxes, cls_scores = jax.vmap(per_class, in_axes=1)(scores[:, 1:])
        # cls_boxes: (C-1, K, 6); cls_scores: (C-1, K)
        labels = jnp.broadcast_to(
            jnp.arange(1, n_classes)[:, None], cls_scores.shape
        )

        flat_scores = cls_scores.reshape(-1)
        flat_boxes = cls_boxes.reshape(-1, 6)
        flat_labels = labels.reshape(-1)

        best_scores, best_idx = jax.lax.top_k(flat_scores, min(top_k, flat_scores.shape[0]))
        sel_valid = best_scores > NEG_INF / 2
        out_boxes = jnp.where(sel_valid[:, None], flat_boxes[best_idx], 0.0)
        out_labels = jnp.where(sel_valid, flat_labels[best_idx], 0)
        out_scores = jnp.where(sel_valid, best_scores, 0.0)
        return out_boxes, out_labels, out_scores, sel_valid.sum()

    boxes, labels, scores, count = jax.vmap(per_image)(predicted_locs, probs)
    return {"boxes": boxes, "labels": labels, "scores": scores, "count": count}


def detections_to_lists(detections, as_numpy: bool = True):
    """Convert padded device detections to the reference's ragged-list format.

    Images with zero detections get the background placeholder
    ([0,0,0,1,1,1], label 0, score 0) exactly like ssd3d.py:437-440.
    Returns (boxes_list, labels_list, scores_list) of per-image numpy arrays.
    """
    boxes = np.asarray(detections["boxes"])
    labels = np.asarray(detections["labels"])
    scores = np.asarray(detections["scores"])
    count = np.asarray(detections["count"])

    boxes_list, labels_list, scores_list = [], [], []
    for i in range(boxes.shape[0]):
        n = int(count[i])
        if n == 0:
            boxes_list.append(np.array([[0.0, 0.0, 0.0, 1.0, 1.0, 1.0]], dtype=np.float32))
            labels_list.append(np.array([0], dtype=np.int64))
            scores_list.append(np.array([0.0], dtype=np.float32))
        else:
            boxes_list.append(boxes[i, :n].astype(np.float32))
            labels_list.append(labels[i, :n].astype(np.int64))
            scores_list.append(scores[i, :n].astype(np.float32))
    return boxes_list, labels_list, scores_list

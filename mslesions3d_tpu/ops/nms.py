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


def greedy_nms_sequential(
    boxes_corner: jnp.ndarray, valid: jnp.ndarray, max_overlap
) -> jnp.ndarray:
    """Greedy NMS as a literal K-iteration sequential loop (reference order,
    ssd3d.py:413-426). Exact but slow on TPU: each of the K fori_loop
    iterations pays dispatch latency (~12 ms for K=1000 at batch 128), so
    this is kept only as the parity oracle for :func:`greedy_nms`.

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


def greedy_nms(boxes_corner: jnp.ndarray, valid: jnp.ndarray, max_overlap) -> jnp.ndarray:
    """Exact greedy NMS via MXU fixpoint iteration; returns keep mask (K,).

    The greedy keep set is the unique fixpoint of

        F(keep)[i] = valid[i] & not any_{j<i} (keep[j] & iou[j,i] > t)

    (induction over score order shows any fixpoint satisfies the greedy
    recurrence, which has a unique solution). Iterating F from keep=valid
    converges in <= suppression-chain-depth steps — the agreement prefix
    with the greedy solution grows by >=1 per iteration and never shrinks —
    and each step is one (K,)x(K,K) mat-vec that XLA maps onto the MXU.
    Typical detections converge in a handful of iterations, vs K sequential
    dispatch-latency-bound steps for the literal loop: ~40x faster NMS at
    K=1000, batch 128 on v5e. Suppression semantics (strict score order,
    suppress iff IoU > max_overlap) match the reference exactly
    (ssd3d.py:413-426); parity with :func:`greedy_nms_sequential` is tested
    over random candidate sets.

    boxes_corner: (K, 6) sorted by decreasing score; valid: (K,) bool.
    """
    k = boxes_corner.shape[0]
    iou = pairwise_iou(boxes_corner, boxes_corner)  # (K, K)
    # M[j, i] = "j (higher-scored) suppresses i if kept"; bf16 so the
    # per-iteration mat-vec streams half the bytes of an f32 matrix.
    tri = jnp.tril(jnp.ones((k, k), dtype=bool), k=-1).T  # j < i
    m = ((iou > max_overlap) & tri).astype(jnp.bfloat16)

    def cond(carry):
        _, changed = carry
        return changed

    def body(carry):
        keep, _ = carry
        # f32 accumulation: counts are exact small integers, compared to 0
        counts = jnp.matmul(
            keep.astype(jnp.bfloat16), m, preferred_element_type=jnp.float32
        )  # (K,): number of kept suppressors of i
        new = valid & (counts == 0)
        return new, jnp.any(new != keep)

    keep, _ = jax.lax.while_loop(cond, body, (valid, jnp.asarray(True)))
    return keep


@partial(jax.jit, static_argnames=("n_classes", "top_k", "nms_impl", "max_overlap"))
def detect_objects(
    predicted_locs: jnp.ndarray,  # (B, P, 6)
    predicted_scores: jnp.ndarray,  # (B, P, n_classes) raw logits
    priors_center: jnp.ndarray,  # (P, 6)
    *,
    n_classes: int,
    min_score,
    max_overlap,
    top_k: int,
    nms_impl: str = "auto",
):
    """Batched decode + per-class NMS + global top-k, fully on device.

    All (image, class) candidate sets are flattened into one (B*(C-1), K)
    batch so the NMS backend sees a single regular launch. ``nms_impl``
    selects the suppression backend: "pallas" = fused VMEM kernel
    (kernels/nms.py, TPU only), "xla" = MXU fixpoint with an HBM IoU matrix
    (:func:`greedy_nms`), "auto" = pallas on TPU else xla. Both are exact
    greedy NMS with reference order semantics.

    Returns dict with
      boxes  (B, top_k, 6) corner form (padding zeros)
      labels (B, top_k) int (padding 0)
      scores (B, top_k) float (padding 0)
      count  (B,) number of valid detections
    """
    b, num_priors, _ = predicted_scores.shape
    cm = n_classes - 1
    k = min(10 * top_k, num_priors)
    # VMEM guard: the pallas kernel stages a (k_pad, k_pad) bf16 suppression
    # matrix in VMEM (kernels/nms.py); a user-configured top_k in the
    # thousands would blow the ~16 MB budget and fail Mosaic compilation.
    _TILE = 128
    k_pad = -(-k // _TILE) * _TILE
    pallas_vmem_bytes = k_pad * k_pad * 2
    PALLAS_VMEM_BUDGET = 12 * 1024 * 1024  # leave headroom for box blocks
    if nms_impl == "auto":
        fits = pallas_vmem_bytes <= PALLAS_VMEM_BUDGET
        nms_impl = "pallas" if (jax.default_backend() == "tpu" and fits) else "xla"
    elif nms_impl == "pallas" and pallas_vmem_bytes > PALLAS_VMEM_BUDGET:
        raise ValueError(
            f"nms_impl='pallas' needs a ({k_pad}, {k_pad}) bf16 VMEM scratch "
            f"({pallas_vmem_bytes / 2**20:.1f} MiB > "
            f"{PALLAS_VMEM_BUDGET / 2**20:.0f} MiB budget) for top_k={top_k}; "
            "lower top_k or use nms_impl='xla'"
        )

    probs = jax.nn.softmax(predicted_scores.astype(jnp.float32), axis=-1)  # (B, P, C)
    decoded = jax.vmap(
        lambda l: center_to_corner(decode_boxes(l.astype(jnp.float32), priors_center))
    )(predicted_locs)  # (B, P, 6)

    # flatten (image, class) -> N rows of P candidate scores
    cls_scores = jnp.swapaxes(probs[:, :, 1:], 1, 2).reshape(b * cm, num_priors)
    cand_scores, cand_idx = jax.lax.top_k(cls_scores, k)  # (N, k)
    decoded_exp = jnp.broadcast_to(
        decoded[:, None], (b, cm, num_priors, 6)
    ).reshape(b * cm, num_priors, 6)
    cand_boxes = jnp.take_along_axis(decoded_exp, cand_idx[..., None], axis=1)  # (N, k, 6)
    cand_valid = cand_scores > min_score

    if nms_impl == "pallas":
        from ..kernels.nms import greedy_nms_pallas

        keep = greedy_nms_pallas(cand_boxes, cand_valid, float(max_overlap))
    else:
        keep = jax.vmap(lambda bx, v: greedy_nms(bx, v, max_overlap))(
            cand_boxes, cand_valid
        )
    kept_scores = jnp.where(keep, cand_scores, NEG_INF)  # (N, k)

    # per image: global top-k across classes
    labels = jnp.broadcast_to(jnp.arange(1, n_classes)[None, :, None], (b, cm, k))
    flat_scores = kept_scores.reshape(b, cm * k)
    flat_boxes = cand_boxes.reshape(b, cm * k, 6)
    flat_labels = labels.reshape(b, cm * k)

    best_scores, best_idx = jax.lax.top_k(flat_scores, min(top_k, cm * k))
    sel_valid = best_scores > NEG_INF / 2
    picked_boxes = jnp.take_along_axis(flat_boxes, best_idx[..., None], axis=1)
    picked_labels = jnp.take_along_axis(flat_labels, best_idx, axis=1)
    out_boxes = jnp.where(sel_valid[..., None], picked_boxes, 0.0)
    out_labels = jnp.where(sel_valid, picked_labels, 0)
    out_scores = jnp.where(sel_valid, best_scores, 0.0)
    return {
        "boxes": out_boxes,
        "labels": out_labels,
        "scores": out_scores,
        "count": sel_valid.sum(-1),
    }


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

"""Parity tests for greedy 3D NMS + detect_objects against a numpy mirror of
the reference's sequential suppression loop (lesions3d/ssd3d.py:344-460)."""

import numpy as np
import jax.numpy as jnp

from mslesions3d_tpu.ops import greedy_nms, detect_objects
from mslesions3d_tpu.ops.boxes import center_to_corner, decode_boxes
from mslesions3d_tpu.ops.nms import detections_to_lists


def np_iou(s1, s2):
    lower = np.maximum(s1[:, None, :3], s2[None, :, :3])
    upper = np.minimum(s1[:, None, 3:], s2[None, :, 3:])
    dims = np.clip(upper - lower, 0, None)
    inter = dims[..., 0] * dims[..., 1] * dims[..., 2]
    v1 = np.prod(s1[:, 3:] - s1[:, :3], -1)
    v2 = np.prod(s2[:, 3:] - s2[:, :3], -1)
    return inter / (v1[:, None] + v2[None, :] - inter)


def reference_nms(boxes_sorted, valid, max_overlap):
    """Numpy mirror of the reference greedy loop."""
    n = boxes_sorted.shape[0]
    overlap = np_iou(boxes_sorted, boxes_sorted)
    suppress = np.zeros(n, dtype=bool)
    for i in range(n):
        if suppress[i] or not valid[i]:
            continue
        suppress |= overlap[i] > max_overlap
        suppress[i] = False
    return valid & ~suppress


def random_sorted_candidates(n=30, seed=1):
    rng = np.random.default_rng(seed)
    lo = rng.uniform(0.0, 0.6, size=(n, 3))
    hi = lo + rng.uniform(0.05, 0.4, size=(n, 3))
    boxes = np.concatenate([lo, np.minimum(hi, 1.0)], 1).astype(np.float32)
    scores = np.sort(rng.uniform(0, 1, n).astype(np.float32))[::-1]
    return boxes, scores


def test_greedy_nms_parity():
    for seed in range(5):
        boxes, scores = random_sorted_candidates(seed=seed)
        valid = scores > 0.3
        keep = np.asarray(greedy_nms(jnp.asarray(boxes), jnp.asarray(valid), 0.5))
        expected = reference_nms(boxes, valid, 0.5)
        np.testing.assert_array_equal(keep, expected)


def test_greedy_nms_fixpoint_matches_sequential_large():
    """The MXU fixpoint NMS must equal the literal sequential loop on dense
    candidate sets with deep suppression chains (chains of boxes where each
    suppresses the next: kept/suppressed alternates down the chain)."""
    from mslesions3d_tpu.ops.nms import greedy_nms_sequential

    for seed in range(4):
        rng = np.random.default_rng(100 + seed)
        # clustered boxes -> long suppression chains
        centers = rng.uniform(0.2, 0.8, size=(40, 3))
        idx = rng.integers(0, 40, size=256)
        jitter = rng.normal(0, 0.02, size=(256, 3))
        lo = np.clip(centers[idx] + jitter - 0.05, 0, 1)
        hi = np.clip(lo + rng.uniform(0.05, 0.15, size=(256, 3)), 0, 1)
        boxes = np.concatenate([lo, hi], 1).astype(np.float32)
        valid = rng.uniform(size=256) > 0.1
        for t in (0.3, 0.5, 0.7):
            fix = np.asarray(greedy_nms(jnp.asarray(boxes), jnp.asarray(valid), t))
            seq = np.asarray(
                greedy_nms_sequential(jnp.asarray(boxes), jnp.asarray(valid), t)
            )
            np.testing.assert_array_equal(fix, seq)
            np.testing.assert_array_equal(fix, reference_nms(boxes, valid, t))


def test_greedy_nms_chain_alternation():
    """A strict chain a>b>c>d... (each overlaps only its neighbor) must keep
    alternating boxes — the worst case for fixpoint convergence."""
    n = 64
    # identical-size boxes sliding along x so consecutive pairs overlap >0.5
    starts = np.arange(n, dtype=np.float32) * 0.004
    boxes = np.stack(
        [starts, np.zeros(n, np.float32), np.zeros(n, np.float32),
         starts + 0.012, np.ones(n, np.float32) * 0.012,
         np.ones(n, np.float32) * 0.012], 1,
    )
    valid = np.ones(n, bool)
    keep = np.asarray(greedy_nms(jnp.asarray(boxes), jnp.asarray(valid), 0.4))
    np.testing.assert_array_equal(keep, reference_nms(boxes, valid, 0.4))


def test_greedy_nms_suppresses_duplicates():
    box = np.array([[0.1, 0.1, 0.1, 0.5, 0.5, 0.5]], dtype=np.float32)
    boxes = np.concatenate([box, box + 0.01, box + 0.4], 0)
    valid = np.ones(3, dtype=bool)
    keep = np.asarray(greedy_nms(jnp.asarray(boxes), jnp.asarray(valid), 0.5))
    assert keep[0] and not keep[1] and keep[2]


def test_detect_objects_end_to_end():
    """Full pipeline against a per-class numpy reference."""
    rng = np.random.default_rng(42)
    num_priors, n_classes, top_k = 200, 3, 10

    centers = rng.uniform(0.2, 0.8, size=(num_priors, 3))
    sizes = rng.uniform(0.1, 0.3, size=(num_priors, 3))
    priors = np.concatenate([centers, sizes], 1).astype(np.float32)
    locs = rng.normal(0, 0.5, size=(2, num_priors, 6)).astype(np.float32)
    logits = rng.normal(0, 2, size=(2, num_priors, n_classes)).astype(np.float32)

    det = detect_objects(
        jnp.asarray(locs), jnp.asarray(logits), jnp.asarray(priors),
        n_classes=n_classes, min_score=0.5, max_overlap=0.5, top_k=top_k,
    )

    # numpy reference for image 0
    def softmax(x):
        e = np.exp(x - x.max(-1, keepdims=True))
        return e / e.sum(-1, keepdims=True)

    for img in range(2):
        probs = softmax(logits[img])
        decoded = np.asarray(center_to_corner(decode_boxes(jnp.asarray(locs[img]), jnp.asarray(priors))))
        all_boxes, all_labels, all_scores = [], [], []
        for c in range(1, n_classes):
            cs = probs[:, c]
            mask = cs > 0.5
            if mask.sum() == 0:
                continue
            idx = np.argsort(-cs[mask], kind="stable")
            cand_boxes = decoded[mask][idx]
            cand_scores = cs[mask][idx]
            keep = reference_nms(cand_boxes, np.ones(len(cand_boxes), bool), 0.5)
            all_boxes.append(cand_boxes[keep])
            all_labels.append(np.full(keep.sum(), c))
            all_scores.append(cand_scores[keep])
        if all_boxes:
            all_boxes = np.concatenate(all_boxes)
            all_labels = np.concatenate(all_labels)
            all_scores = np.concatenate(all_scores)
            order = np.argsort(-all_scores, kind="stable")[:top_k]
            exp_scores = all_scores[order]
            exp_count = len(order)
        else:
            exp_scores = np.zeros(0)
            exp_count = 0

        n = int(det["count"][img])
        assert n == exp_count
        np.testing.assert_allclose(np.asarray(det["scores"][img][:n]), exp_scores, rtol=1e-5, atol=1e-6)


def test_detections_to_lists_placeholder():
    det = {
        "boxes": np.zeros((1, 5, 6)),
        "labels": np.zeros((1, 5), np.int64),
        "scores": np.zeros((1, 5)),
        "count": np.array([0]),
    }
    boxes, labels, scores = detections_to_lists(det)
    np.testing.assert_array_equal(boxes[0], [[0, 0, 0, 1, 1, 1]])
    assert labels[0][0] == 0 and scores[0][0] == 0.0

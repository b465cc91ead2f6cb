"""Parity tests for MultiBox prior matching against a straightforward numpy
implementation of the reference semantics (lesions3d/ssd3d.py:851-888)."""

import numpy as np
import jax.numpy as jnp

from mslesions3d_tpu.ops import match_priors_single, match_priors_batch
from mslesions3d_tpu.ops.boxes import center_to_corner, corner_to_center, encode_boxes


def np_iou(s1, s2):
    lower = np.maximum(s1[:, None, :3], s2[None, :, :3])
    upper = np.minimum(s1[:, None, 3:], s2[None, :, 3:])
    dims = np.clip(upper - lower, 0, None)
    inter = dims[..., 0] * dims[..., 1] * dims[..., 2]
    v1 = np.prod(s1[:, 3:] - s1[:, :3], -1)
    v2 = np.prod(s2[:, 3:] - s2[:, :3], -1)
    return inter / (v1[:, None] + v2[None, :] - inter)


def reference_match(boxes, labels, priors_corner, thr_lo, thr_hi=None):
    """Unchunked numpy mirror of the reference matcher."""
    n_objects = boxes.shape[0]
    overlap = np_iou(boxes, priors_corner)  # (M, P)
    object_for_prior = overlap.argmax(0)
    overlap_for_prior = overlap.max(0)
    prior_for_object = overlap.argmax(1)

    # torch scatter: later (higher) object index wins on collision
    for j in range(n_objects):
        object_for_prior[prior_for_object[j]] = j
        overlap_for_prior[prior_for_object[j]] = 1.0

    label_for_prior = labels[object_for_prior].copy()
    if thr_hi is None:
        label_for_prior[overlap_for_prior < thr_lo] = 0
    else:
        band = (overlap_for_prior >= thr_lo) & (overlap_for_prior < thr_hi)
        label_for_prior[overlap_for_prior < thr_lo] = 0
        label_for_prior[band] = -1
    return object_for_prior, label_for_prior


def make_priors(n=64, seed=3):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(0.1, 0.9, size=(n, 3))
    sizes = rng.uniform(0.08, 0.25, size=(n, 3))
    pc = np.concatenate([centers, sizes], 1).astype(np.float32)
    return np.asarray(center_to_corner(jnp.asarray(pc))), pc


def make_gt(m=5, seed=11):
    rng = np.random.default_rng(seed)
    lo = rng.uniform(0.05, 0.5, size=(m, 3))
    hi = lo + rng.uniform(0.1, 0.4, size=(m, 3))
    boxes = np.concatenate([lo, np.minimum(hi, 1.0)], 1).astype(np.float32)
    labels = rng.integers(1, 3, size=(m,)).astype(np.int32)
    return boxes, labels


def test_hard_threshold_parity():
    priors_corner, priors_center = make_priors()
    boxes, labels = make_gt()
    mask = np.ones(len(boxes), dtype=bool)

    loc_t, cls_t = match_priors_single(
        jnp.asarray(boxes), jnp.asarray(labels), jnp.asarray(mask),
        jnp.asarray(priors_corner), jnp.asarray(priors_center), 0.5,
    )
    obj_ref, lbl_ref = reference_match(boxes, labels, priors_corner, 0.5)
    np.testing.assert_array_equal(np.asarray(cls_t), lbl_ref)

    expected_locs = np.asarray(
        encode_boxes(corner_to_center(jnp.asarray(boxes[obj_ref])), jnp.asarray(priors_center))
    )
    np.testing.assert_allclose(np.asarray(loc_t), expected_locs, rtol=1e-4, atol=1e-4)


def test_soft_threshold_ignore_band():
    priors_corner, priors_center = make_priors(seed=5)
    boxes, labels = make_gt(seed=13)
    mask = np.ones(len(boxes), dtype=bool)

    _, cls_t = match_priors_single(
        jnp.asarray(boxes), jnp.asarray(labels), jnp.asarray(mask),
        jnp.asarray(priors_corner), jnp.asarray(priors_center), 0.1, 0.2, soft=True,
    )
    _, lbl_ref = reference_match(boxes, labels, priors_corner, 0.1, 0.2)
    np.testing.assert_array_equal(np.asarray(cls_t), lbl_ref)
    assert (np.asarray(cls_t) == -1).any() or True  # band may be empty; parity is the assertion


def test_every_object_gets_a_positive_prior():
    priors_corner, priors_center = make_priors()
    boxes, labels = make_gt(m=4, seed=23)
    mask = np.ones(4, dtype=bool)
    _, cls_t = match_priors_single(
        jnp.asarray(boxes), jnp.asarray(labels), jnp.asarray(mask),
        jnp.asarray(priors_corner), jnp.asarray(priors_center), 0.99,
    )
    # even with an impossible threshold, forced best-prior assignment keeps
    # at least one positive prior per surviving object (ssd3d.py:864-868)
    assert (np.asarray(cls_t) > 0).sum() >= 1


def test_padding_invariance():
    priors_corner, priors_center = make_priors()
    boxes, labels = make_gt(m=3, seed=29)

    def run(m_pad):
        b = np.zeros((m_pad, 6), np.float32)
        l = np.zeros((m_pad,), np.int32)
        mask = np.zeros((m_pad,), bool)
        b[:3], l[:3], mask[:3] = boxes, labels, True
        return match_priors_single(
            jnp.asarray(b), jnp.asarray(l), jnp.asarray(mask),
            jnp.asarray(priors_corner), jnp.asarray(priors_center), 0.5,
        )

    loc8, cls8 = run(8)
    loc16, cls16 = run(16)
    np.testing.assert_array_equal(np.asarray(cls8), np.asarray(cls16))
    np.testing.assert_allclose(np.asarray(loc8), np.asarray(loc16), rtol=1e-6)
    assert np.isfinite(np.asarray(loc8)).all()


def test_empty_image_all_background():
    priors_corner, priors_center = make_priors()
    b = np.zeros((4, 6), np.float32)
    l = np.zeros((4,), np.int32)
    mask = np.zeros((4,), bool)
    loc_t, cls_t = match_priors_single(
        jnp.asarray(b), jnp.asarray(l), jnp.asarray(mask),
        jnp.asarray(priors_corner), jnp.asarray(priors_center), 0.5,
    )
    assert (np.asarray(cls_t) == 0).all()
    np.testing.assert_array_equal(np.asarray(loc_t), 0.0)


def test_batch_matches_single():
    priors_corner, priors_center = make_priors()
    boxes1, labels1 = make_gt(m=3, seed=31)
    boxes2, labels2 = make_gt(m=3, seed=37)
    b = np.stack([boxes1, boxes2])
    l = np.stack([labels1, labels2])
    mask = np.ones((2, 3), bool)

    loc_b, cls_b = match_priors_batch(
        jnp.asarray(b), jnp.asarray(l), jnp.asarray(mask),
        jnp.asarray(priors_corner), jnp.asarray(priors_center), 0.5,
    )
    for i, (bx, lb) in enumerate([(boxes1, labels1), (boxes2, labels2)]):
        loc_s, cls_s = match_priors_single(
            jnp.asarray(bx), jnp.asarray(lb), jnp.asarray(np.ones(3, bool)),
            jnp.asarray(priors_corner), jnp.asarray(priors_center), 0.5,
        )
        np.testing.assert_allclose(np.asarray(loc_b[i]), np.asarray(loc_s), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(cls_b[i]), np.asarray(cls_s))

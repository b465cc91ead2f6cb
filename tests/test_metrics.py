"""Tests for VOC mAP / precision / recall / F1 (reference utils.py:157-396)."""

import numpy as np

from mslesions3d_tpu.ops.metrics import calculate_mAP, compute_metrics_per_class


def boxes(*rows):
    return np.asarray(rows, dtype=np.float32)


def test_perfect_detections():
    gt = [boxes([0.1, 0.1, 0.1, 0.3, 0.3, 0.3], [0.5, 0.5, 0.5, 0.8, 0.8, 0.8])]
    labels = [np.array([1, 1])]
    diffs = [np.array([False, False])]
    det_scores = [np.array([0.9, 0.8], dtype=np.float32)]

    detail = calculate_mAP(gt, labels, det_scores, gt, labels, diffs,
                           n_classes=2, min_overlap=0.5, return_detail=True)
    assert detail["mAP"] == 1.0
    assert detail["precision"] == 1.0
    assert detail["recall"] == 1.0
    assert detail["f1_score"] == 1.0
    assert detail["n_true_boxes"] == 2


def test_false_positive_lowers_precision():
    gt_boxes = [boxes([0.1, 0.1, 0.1, 0.3, 0.3, 0.3])]
    gt_labels = [np.array([1])]
    diffs = [np.array([False])]

    det_boxes = [boxes([0.1, 0.1, 0.1, 0.3, 0.3, 0.3], [0.6, 0.6, 0.6, 0.9, 0.9, 0.9])]
    det_labels = [np.array([1, 1])]
    det_scores = [np.array([0.9, 0.8], dtype=np.float32)]

    detail = calculate_mAP(det_boxes, det_labels, det_scores, gt_boxes, gt_labels, diffs,
                           n_classes=2, min_overlap=0.5, return_detail=True)
    assert detail["precision"] == 0.5
    assert detail["recall"] == 1.0
    # 11-pt AP: TP first at every recall threshold -> AP = 1.0
    assert detail["mAP"] == 1.0


def test_duplicate_detection_is_fp():
    gt_boxes = [boxes([0.1, 0.1, 0.1, 0.3, 0.3, 0.3])]
    gt_labels = [np.array([1])]
    diffs = [np.array([False])]
    det_boxes = [boxes([0.1, 0.1, 0.1, 0.3, 0.3, 0.3], [0.1, 0.1, 0.1, 0.3, 0.3, 0.3])]
    det_labels = [np.array([1, 1])]
    det_scores = [np.array([0.9, 0.8], dtype=np.float32)]

    tp, fp, detected, *_ = compute_metrics_per_class(
        np.array([0, 0]), det_boxes[0], det_scores[0],
        np.array([0]), gt_boxes[0], np.array([False]), 0.5,
    )
    np.testing.assert_array_equal(tp, [1, 0])
    np.testing.assert_array_equal(fp, [0, 1])
    np.testing.assert_array_equal(detected, [1])


def test_low_iou_is_fp():
    tp, fp, *_ = compute_metrics_per_class(
        np.array([0]), boxes([0.6, 0.6, 0.6, 0.9, 0.9, 0.9]), np.array([0.9], np.float32),
        np.array([0]), boxes([0.1, 0.1, 0.1, 0.3, 0.3, 0.3]), np.array([False]), 0.5,
    )
    np.testing.assert_array_equal(tp, [0])
    np.testing.assert_array_equal(fp, [1])


def test_no_detections_detail():
    gt = [boxes([0.1, 0.1, 0.1, 0.3, 0.3, 0.3])]
    detail = calculate_mAP(
        [np.zeros((0, 6))], [np.zeros(0, np.int64)], [np.zeros(0, np.float32)],
        gt, [np.array([1])], [np.array([False])],
        n_classes=2, min_overlap=0.5, return_detail=True,
    )
    assert detail["mAP"] == 0.0
    assert detail["precision"] == 0.0
    assert len(detail["not_found_boxes_volumes_per_class"]) == 1


def test_score_order_determines_assignment():
    """Higher-scored detection claims the GT; the lower becomes FP."""
    gt_boxes = [boxes([0.1, 0.1, 0.1, 0.5, 0.5, 0.5])]
    gt_labels = [np.array([1])]
    diffs = [np.array([False])]
    # Two overlapping detections; the lower-scored one is slightly better IoU.
    det_boxes = [boxes([0.1, 0.1, 0.1, 0.48, 0.5, 0.5], [0.1, 0.1, 0.1, 0.5, 0.5, 0.5])]
    det_labels = [np.array([1, 1])]
    det_scores = [np.array([0.9, 0.2], dtype=np.float32)]

    detail = calculate_mAP(det_boxes, det_labels, det_scores, gt_boxes, gt_labels, diffs,
                           n_classes=2, min_overlap=0.5, return_detail=True)
    np.testing.assert_array_equal(detail["TP"], [1, 0])
    np.testing.assert_array_equal(detail["FP"], [0, 1])


def test_multiimage_aggregation():
    gt_boxes = [boxes([0.1, 0.1, 0.1, 0.3, 0.3, 0.3]), boxes([0.4, 0.4, 0.4, 0.7, 0.7, 0.7])]
    gt_labels = [np.array([1]), np.array([1])]
    diffs = [np.array([False]), np.array([False])]
    # detect only the second image's object
    det_boxes = [np.zeros((0, 6), np.float32), boxes([0.4, 0.4, 0.4, 0.7, 0.7, 0.7])]
    det_labels = [np.zeros(0, np.int64), np.array([1])]
    det_scores = [np.zeros(0, np.float32), np.array([0.9], np.float32)]

    detail = calculate_mAP(det_boxes, det_labels, det_scores, gt_boxes, gt_labels, diffs,
                           n_classes=2, min_overlap=0.5, return_detail=True)
    assert detail["recall"] == 0.5
    assert detail["precision"] == 1.0


def test_multiclass_metrics_detail():
    """n_classes=3 path: per-class dicts, not the binary collapse."""
    gt_boxes = [boxes([0.1, 0.1, 0.1, 0.3, 0.3, 0.3], [0.5, 0.5, 0.5, 0.8, 0.8, 0.8])]
    gt_labels = [np.array([1, 2])]
    diffs = [np.array([False, False])]
    det_scores = [np.array([0.9, 0.8], dtype=np.float32)]

    detail = calculate_mAP(gt_boxes, gt_labels, det_scores, gt_boxes, gt_labels,
                           diffs, n_classes=3, min_overlap=0.5, return_detail=True)
    assert detail["mAP"] == 1.0
    assert isinstance(detail["precision"], dict)
    assert detail["precision"][1] == 1.0 and detail["precision"][2] == 1.0

    from mslesions3d_tpu.ops.metrics import to_jsonable
    import json
    json.dumps(to_jsonable(detail))  # must be serializable end-to-end

"""COCO-style mAP evaluator: known-answer checks for the matching protocol
(greedy by score, one GT per prediction, per-class/per-threshold APs) and the
101-point interpolated AP."""

import numpy as np

from construction_clip_tpu.infer.detection_eval import (
    average_precision, evaluate_detections, detections_to_eval_format)


def test_average_precision_known_curves():
    # perfect single-point curve
    assert average_precision(np.asarray([1.0]), np.asarray([1.0])) == 1.0
    # recall stuck at 0.5 with precision 0.5 -> 0.5 over the first 51 points
    ap = average_precision(np.asarray([0.0, 0.5]), np.asarray([0.0, 0.5]))
    np.testing.assert_allclose(ap, 0.5 * 51 / 101, rtol=1e-9)
    assert average_precision(np.asarray([]), np.asarray([])) == 0.0


def test_perfect_predictions_map_one():
    gt = [{"boxes": [[0, 0, 10, 10], [20, 20, 40, 40]], "labels": [1, 2]}]
    pred = [{"boxes": [[0, 0, 10, 10], [20, 20, 40, 40]], "labels": [1, 2],
             "scores": [0.9, 0.8]}]
    m = evaluate_detections(pred, gt, num_classes=3)
    assert m["mAP"] == 1.0 and m["AP50"] == 1.0 and m["AP75"] == 1.0
    assert m["per_class"] == {1: 1.0, 2: 1.0}


def test_localization_quality_gates_thresholds():
    # IoU vs gt = (10*10 overlap 10x6=60) ... construct IoU ~ 0.6: gt [0,0,10,10],
    # pred [0,4,10,14]: inter 60, union 140 -> IoU = 0.4286 < 0.5 -> always FP.
    # use pred [0,2,10,12]: inter 80, union 120 -> IoU 0.667: TP at 0.5/0.65, FP at 0.7+
    gt = [{"boxes": [[0, 0, 10, 10]], "labels": [1]}]
    pred = [{"boxes": [[0, 2, 10, 12]], "labels": [1], "scores": [0.9]}]
    m = evaluate_detections(pred, gt, num_classes=2)
    assert m["AP50"] == 1.0
    assert m["AP75"] == 0.0
    # mAP averages 1.0 for thresholds .5,.55,.6,.65 and 0 for .7+ -> 4/10
    np.testing.assert_allclose(m["mAP"], 0.4, atol=1e-9)


def test_duplicate_detections_are_fp():
    gt = [{"boxes": [[0, 0, 10, 10]], "labels": [1]}]
    pred = [{"boxes": [[0, 0, 10, 10], [0, 0, 10, 10]], "labels": [1, 1],
             "scores": [0.9, 0.8]}]
    m = evaluate_detections(pred, gt, num_classes=2)
    # the first hit matches; the duplicate is a FP AFTER full recall -> AP still 1
    assert m["AP50"] == 1.0


def test_high_scoring_fp_hurts():
    gt = [{"boxes": [[0, 0, 10, 10], [50, 50, 60, 60]], "labels": [1, 1]}]
    pred = [{"boxes": [[80, 80, 90, 90], [0, 0, 10, 10]], "labels": [1, 1],
             "scores": [0.95, 0.9]}]
    m = evaluate_detections(pred, gt, num_classes=2)
    np.testing.assert_allclose(m["AP50"], 0.5 * 51 / 101, rtol=1e-9)


def test_absent_class_excluded_from_mean():
    gt = [{"boxes": [[0, 0, 10, 10]], "labels": [1]}]
    pred = [{"boxes": [[0, 0, 10, 10]], "labels": [1], "scores": [0.9]}]
    # classes 2..7 have no gt and no predictions -> excluded, mAP stays 1.0
    m = evaluate_detections(pred, gt, num_classes=8)
    assert m["mAP"] == 1.0
    assert set(m["per_class"]) == {1}


def test_detections_to_eval_format():
    from construction_clip_tpu.models.detection import Detections
    import jax.numpy as jnp

    det = Detections(boxes=jnp.asarray([[0, 0, 5, 5], [0, 0, 0, 0]], jnp.float32),
                     labels=jnp.asarray([2, 0], jnp.int32),
                     scores=jnp.asarray([0.7, 0.0], jnp.float32))
    out = detections_to_eval_format(det)
    assert len(out["boxes"]) == 1 and out["labels"][0] == 2


def test_clip_gt_to_center_square():
    from construction_clip_tpu.infer.detection_eval import clip_gt_to_center_square

    # 200x100 (h x w): visible square is x in [0,100] shifted? w<h -> square
    # side 100, x0=0, y0=50: region y in [50,150]
    boxes = [
        [10, 60, 90, 140],    # fully inside -> kept unchanged
        [10, 0, 90, 40],      # fully above the square -> excluded
        [10, 40, 90, 140],    # 80% inside -> kept, clipped to y>=50
    ]
    labels = [1, 2, 3]
    out_b, out_l, n_out = clip_gt_to_center_square(boxes, labels, h=200, w=100)
    assert n_out == 1
    assert out_l == [1, 3]
    assert out_b[0] == [10.0, 60.0, 90.0, 140.0]
    assert out_b[1] == [10.0, 50.0, 90.0, 140.0]

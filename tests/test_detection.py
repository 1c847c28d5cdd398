"""Faster R-CNN pieces: box coding round trip, IoU, static NMS vs numpy greedy,
ROIAlign vs manual bilinear, anchors vs torchvision's formula, end-to-end infer
contract, converter layout."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from construction_clip_tpu.models.detection import (
    level_anchors, decode_boxes, box_iou, nms_mask, roi_align,
    init_fasterrcnn, fasterrcnn_infer, from_torchvision_state_dict,
    ANCHOR_SIZES, ASPECT_RATIOS)


def test_anchor_formula():
    """torchvision AnchorGenerator: for ratio r, h = size*sqrt(r), w = size/sqrt(r),
    centered at cell*stride."""
    a = np.asarray(level_anchors(2, 3, stride=8, size=32))
    assert a.shape == (2 * 3 * 3, 4)
    # first cell (0,0), ratio 0.5: w = 32/sqrt(.5), h = 32*sqrt(.5)
    w = 32 / np.sqrt(0.5)
    h = 32 * np.sqrt(0.5)
    np.testing.assert_allclose(a[0], [-w / 2, -h / 2, w / 2, h / 2], rtol=1e-5)
    # second cell in x shifts by stride
    np.testing.assert_allclose(a[3] - a[0], [8, 0, 8, 0], atol=1e-5)


def test_box_coding_roundtrip(rng):
    anchors = jnp.asarray(rng.uniform(0, 100, (16, 4)).astype(np.float32))
    anchors = jnp.concatenate([anchors[:, :2], anchors[:, :2] + 10 +
                               jnp.abs(anchors[:, 2:])], axis=-1)
    # zero deltas -> identical boxes
    out = decode_boxes(jnp.zeros((16, 4)), anchors)
    np.testing.assert_allclose(np.asarray(out), np.asarray(anchors), rtol=1e-5)
    # dx=1 moves center by width
    out = decode_boxes(jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (16, 1)), anchors)
    shift = np.asarray(anchors[:, 2] - anchors[:, 0])
    np.testing.assert_allclose(np.asarray(out[:, 0] - anchors[:, 0]), shift, rtol=1e-4)


def test_iou():
    a = jnp.asarray([[0, 0, 10, 10]], jnp.float32)
    b = jnp.asarray([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]], jnp.float32)
    iou = np.asarray(box_iou(a, b))[0]
    np.testing.assert_allclose(iou, [1.0, 25 / 175, 0.0], rtol=1e-5)


def test_nms_matches_numpy_greedy(rng):
    n = 60
    boxes = rng.uniform(0, 80, (n, 2)).astype(np.float32)
    boxes = np.concatenate([boxes, boxes + rng.uniform(5, 30, (n, 2))], axis=1)
    scores = rng.random(n).astype(np.float32)

    # numpy greedy NMS
    order = np.argsort(-scores)
    alive_ref = []
    suppressed = np.zeros(n, bool)
    for i in order:
        if suppressed[i]:
            continue
        alive_ref.append(i)
        bi = boxes[i]
        for j in order:
            if j == i or suppressed[j]:
                continue
            xx1 = max(bi[0], boxes[j][0]); yy1 = max(bi[1], boxes[j][1])
            xx2 = min(bi[2], boxes[j][2]); yy2 = min(bi[3], boxes[j][3])
            inter = max(0, xx2 - xx1) * max(0, yy2 - yy1)
            a1 = (bi[2] - bi[0]) * (bi[3] - bi[1])
            a2 = (boxes[j][2] - boxes[j][0]) * (boxes[j][3] - boxes[j][1])
            if inter / (a1 + a2 - inter) > 0.5 and scores[j] <= scores[i]:
                suppressed[j] = True

    idx, keep = nms_mask(jnp.asarray(boxes), jnp.asarray(scores),
                         iou_threshold=0.5, max_out=n)
    ours = sorted(int(i) for i, k in zip(np.asarray(idx), np.asarray(keep)) if k)
    assert ours == sorted(alive_ref)


def test_roi_align_constant_region():
    """A constant feature map pools to that constant; a linear ramp pools to the
    bin-center value (bilinear exactness on linear functions)."""
    H = W = 16
    feat = jnp.broadcast_to(jnp.asarray(3.5), (H, W, 1))
    boxes = jnp.asarray([[2.0, 2.0, 10.0, 10.0]])
    out = roi_align(feat, boxes, spatial_scale=1.0)
    np.testing.assert_allclose(np.asarray(out), np.full((1, 7, 7, 1), 3.5), rtol=1e-6)

    ramp = jnp.broadcast_to(jnp.arange(W, dtype=jnp.float32)[None, :, None], (H, W, 1))
    out = np.asarray(roi_align(ramp, boxes, spatial_scale=1.0))[0, 0, :, 0]
    # bin centers along x: x1 + (i+0.5)*bin_w, feature value = x - 0.5
    bin_w = 8.0 / 7
    expect = 2.0 + (np.arange(7) + 0.5) * bin_w - 0.5
    np.testing.assert_allclose(out, expect, rtol=1e-5)


def test_end_to_end_infer_contract(rng):
    params = init_fasterrcnn(jax.random.key(0), num_classes=8)
    img = jnp.asarray(rng.random((224, 224, 3)).astype(np.float32))
    det = fasterrcnn_infer(params, img, image_size=224, pre_nms_topk=100,
                           post_nms_topk=50, detections_per_img=10)
    assert det.boxes.shape == (10, 4)
    assert det.labels.shape == (10,) and det.scores.shape == (10,)
    assert np.isfinite(np.asarray(det.boxes)).all()
    b = np.asarray(det.boxes)
    assert (b >= 0).all() and (b <= 224).all()
    s = np.asarray(det.scores)
    assert (np.diff(s) <= 1e-6).all()  # sorted desc


def test_converter_layout(rng):
    """Synthetic torchvision-named state dict (new Conv2dNormActivation naming)
    converts and runs."""
    import torch

    from construction_clip_tpu.models.resnet import STAGES

    sd = {}
    # resnet body
    def conv(o, i, k):
        return torch.randn(o, i, k, k) * 0.01

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = torch.ones(c)
        sd[f"{prefix}.bias"] = torch.zeros(c)
        sd[f"{prefix}.running_mean"] = torch.zeros(c)
        sd[f"{prefix}.running_var"] = torch.ones(c)

    sd["backbone.body.conv1.weight"] = conv(64, 3, 7)
    bn("backbone.body.bn1", 64)
    c_in = 64
    for s, (n, w) in enumerate(zip(STAGES, (64, 128, 256, 512))):
        for b in range(n):
            pre = f"backbone.body.layer{s+1}.{b}"
            sd[f"{pre}.conv1.weight"] = conv(w, c_in, 1)
            bn(f"{pre}.bn1", w)
            sd[f"{pre}.conv2.weight"] = conv(w, w, 3)
            bn(f"{pre}.bn2", w)
            sd[f"{pre}.conv3.weight"] = conv(w * 4, w, 1)
            bn(f"{pre}.bn3", w * 4)
            if c_in != w * 4:
                sd[f"{pre}.downsample.0.weight"] = conv(w * 4, c_in, 1)
                bn(f"{pre}.downsample.1", w * 4)
            c_in = w * 4
    for i, w in enumerate((256, 512, 1024, 2048)):
        sd[f"backbone.fpn.inner_blocks.{i}.0.weight"] = conv(256, w, 1)
        sd[f"backbone.fpn.inner_blocks.{i}.0.bias"] = torch.zeros(256)
        sd[f"backbone.fpn.layer_blocks.{i}.0.weight"] = conv(256, 256, 3)
        sd[f"backbone.fpn.layer_blocks.{i}.0.bias"] = torch.zeros(256)
    sd["rpn.head.conv.0.0.weight"] = conv(256, 256, 3)
    sd["rpn.head.conv.0.0.bias"] = torch.zeros(256)
    sd["rpn.head.cls_logits.weight"] = conv(3, 256, 1)
    sd["rpn.head.cls_logits.bias"] = torch.zeros(3)
    sd["rpn.head.bbox_pred.weight"] = conv(12, 256, 1)
    sd["rpn.head.bbox_pred.bias"] = torch.zeros(12)
    sd["roi_heads.box_head.fc6.weight"] = torch.randn(1024, 256 * 49) * 0.01
    sd["roi_heads.box_head.fc6.bias"] = torch.zeros(1024)
    sd["roi_heads.box_head.fc7.weight"] = torch.randn(1024, 1024) * 0.01
    sd["roi_heads.box_head.fc7.bias"] = torch.zeros(1024)
    sd["roi_heads.box_predictor.cls_score.weight"] = torch.randn(8, 1024) * 0.01
    sd["roi_heads.box_predictor.cls_score.bias"] = torch.zeros(8)
    sd["roi_heads.box_predictor.bbox_pred.weight"] = torch.randn(32, 1024) * 0.01
    sd["roi_heads.box_predictor.bbox_pred.bias"] = torch.zeros(32)

    params = from_torchvision_state_dict(sd, num_classes=8)
    img = jnp.zeros((224, 224, 3))
    det = fasterrcnn_infer(params, img, image_size=224, pre_nms_topk=50,
                           post_nms_topk=20, detections_per_img=5)
    assert det.boxes.shape == (5, 4)


def test_jax_detector_serving_interface(rng):
    """JaxDetector through the serving Detector protocol: original-resolution box
    mapping + threshold/name wrapper."""
    from construction_clip_tpu.serve.detector import JaxDetector, ThresholdWrapper

    det = JaxDetector(None, image_size=128)
    img = (rng.random((300, 400, 3)) * 255).astype(np.uint8)
    out = det.detect(img)
    assert set(out) == {"boxes", "labels", "scores"}
    for b in out["boxes"]:
        assert 0 <= b[0] <= 400 and 0 <= b[1] <= 300

    wrapped = ThresholdWrapper(det, threshold=2.0)  # impossible threshold
    out = wrapped.detect(img)
    assert out == {"boxes": [], "labels": [], "scores": []}

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


def test_nms_fixpoint_suppression_chain():
    """Adversarial case for the fixed-point NMS: a long chain where box i
    suppresses only box i+1 (greedy keeps exactly the even-indexed boxes).
    This maximizes the fixed-point iteration's decision depth — each box's
    fate depends on the one before it — so it exercises the worst-case
    convergence path, where a naive one/two-pass scheme returns the wrong
    over-/under-approximation."""
    n = 64
    # overlapping staircase: box i = [8i, 0, 8i+16, 16] overlaps i+1 with
    # IoU 8*16/(2*16*16-8*16) = 1/3 > 0.3, overlaps i+2 with IoU 0
    boxes = np.stack([8.0 * np.arange(n), np.zeros(n),
                      8.0 * np.arange(n) + 16, np.full(n, 16.0)],
                     axis=1).astype(np.float32)
    scores = np.linspace(1.0, 0.5, n).astype(np.float32)  # descending order
    idx, keep = nms_mask(jnp.asarray(boxes), jnp.asarray(scores),
                         iou_threshold=0.3, max_out=n)
    ours = sorted(int(i) for i, k in zip(np.asarray(idx), np.asarray(keep)) if k)
    assert ours == list(range(0, n, 2))


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
    # aligned=False (torchvision detection convention): pixel centers sit at
    # integer coords, so bilinear at x returns the ramp value x itself; bin
    # centers along x: x1 + (i+0.5)*bin_w
    bin_w = 8.0 / 7
    expect = 2.0 + (np.arange(7) + 0.5) * bin_w
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


def test_roi_align_multilevel_matches_per_level_select(rng):
    """roi_align_multilevel (one flat gather, each box at its own level) ==
    the per-level roi_align + lvl_assign select it replaced (which pooled
    every box at every level and masked 3/4 away — 119.6 of 154 ms of b=8
    inference, tools/attr_detection.py)."""
    from construction_clip_tpu.models.detection import roi_align_multilevel

    C = 8
    feats = [jnp.asarray(rng.random((s, s, C)).astype(np.float32))
             for s in (64, 32, 16, 8)]
    strides = (4, 8, 16, 32)
    n = 25
    boxes = rng.random((n, 4)).astype(np.float32) * 200
    boxes[:, 2:] = boxes[:, :2] + 8 + rng.random((n, 2)).astype(np.float32) * 100
    boxes = jnp.asarray(boxes)
    lvl = jnp.asarray(rng.integers(0, 4, n), jnp.int32)

    ml = roi_align_multilevel(feats, boxes, lvl, strides=strides)

    ref = jnp.zeros((n, 7, 7, C))
    for l in range(4):
        fl = roi_align(feats[l], boxes, spatial_scale=1.0 / strides[l])
        ref = jnp.where((lvl == l)[:, None, None, None], fl, ref)
    np.testing.assert_allclose(np.asarray(ml), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_infer_bf16_compute_contract(rng):
    """compute_dtype=bf16 (the serving configuration — backbone/FPN/heads on
    the MXU in bf16, ALL box arithmetic upcast to fp32) returns the same
    fixed-size fp32 contract. Random weights amplify bf16 rounding through 50
    conv layers, so this pins structure, dtypes, and validity — score/box
    parity is a trained-weight property (same argument as the int8 caption
    agreement note, tools/bench_serve.py)."""
    params = init_fasterrcnn(jax.random.key(0), num_classes=8)
    img = jnp.asarray(rng.random((224, 224, 3)).astype(np.float32))
    det = fasterrcnn_infer(params, img, image_size=224, pre_nms_topk=100,
                           post_nms_topk=50, detections_per_img=10,
                           compute_dtype=jnp.bfloat16)
    assert det.boxes.dtype == jnp.float32
    assert det.scores.dtype == jnp.float32
    assert det.boxes.shape == (10, 4)
    assert np.isfinite(np.asarray(det.boxes)).all()
    b = np.asarray(det.boxes)
    assert (b >= 0).all() and (b <= 224).all()
    s = np.asarray(det.scores)
    assert (s >= 0).all() and (s <= 1).all()
    assert (np.diff(s) <= 1e-6).all()


def _synthetic_tv_state_dict(seed: int = 3):
    """Torchvision-named fasterrcnn_resnet50_fpn state dict (new
    Conv2dNormActivation naming) with random weights — the offline stand-in for
    `fasterrcnn_resnet50_fpn(weights=None)` (torchvision is not in this image)."""
    import torch

    from construction_clip_tpu.models.resnet import STAGES

    torch.manual_seed(seed)
    sd = {}

    def conv(o, i, k):
        return torch.randn(o, i, k, k) * 0.03

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = torch.ones(c) + torch.randn(c) * 0.05
        sd[f"{prefix}.bias"] = torch.randn(c) * 0.05
        sd[f"{prefix}.running_mean"] = torch.randn(c) * 0.05
        sd[f"{prefix}.running_var"] = torch.ones(c) + torch.rand(c) * 0.1

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

    return sd


def test_converter_layout():
    """Synthetic torchvision-named state dict (new Conv2dNormActivation naming)
    converts and runs."""
    sd = _synthetic_tv_state_dict()
    params = from_torchvision_state_dict(sd, num_classes=8)
    img = jnp.zeros((224, 224, 3))
    det = fasterrcnn_infer(params, img, image_size=224, pre_nms_topk=50,
                           post_nms_topk=20, detections_per_img=5)
    assert det.boxes.shape == (5, 4)


# ------------------------------------------------------ full-forward parity ref

def _np_greedy_nms(boxes, scores, thresh):
    """Plain numpy greedy NMS over ALL candidates; returns kept indices in
    descending-score order (torchvision nms contract)."""
    order = np.argsort(-scores)
    kept = []
    suppressed = np.zeros(len(scores), bool)
    for i in order:
        if suppressed[i]:
            continue
        kept.append(i)
        bi = boxes[i]
        for j in order:
            if suppressed[j] or j == i:
                continue
            xx1 = max(bi[0], boxes[j][0]); yy1 = max(bi[1], boxes[j][1])
            xx2 = min(bi[2], boxes[j][2]); yy2 = min(bi[3], boxes[j][3])
            inter = max(0.0, xx2 - xx1) * max(0.0, yy2 - yy1)
            a1 = (bi[2] - bi[0]) * (bi[3] - bi[1])
            a2 = (boxes[j][2] - boxes[j][0]) * (boxes[j][3] - boxes[j][1])
            if inter / max(a1 + a2 - inter, 1e-6) > thresh:
                suppressed[j] = True
    return kept


def _np_decode(deltas, anchors, size):
    ax = (anchors[:, 0] + anchors[:, 2]) / 2
    ay = (anchors[:, 1] + anchors[:, 3]) / 2
    aw = anchors[:, 2] - anchors[:, 0]
    ah = anchors[:, 3] - anchors[:, 1]
    dw = np.minimum(deltas[:, 2], np.log(1000.0 / 16))
    dh = np.minimum(deltas[:, 3], np.log(1000.0 / 16))
    cx = deltas[:, 0] * aw + ax
    cy = deltas[:, 1] * ah + ay
    w = np.exp(dw) * aw
    h = np.exp(dh) * ah
    b = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)
    return np.clip(b, 0, size)


def _np_roi_align(feat_hwc, boxes, scale, out=7, sr=2):
    """Independent numpy roi_align, aligned=False, per the torchvision kernel."""
    H, W, C = feat_hwc.shape

    def bilinear(y, x):
        if y < -1.0 or y > H or x < -1.0 or x > W:
            return np.zeros(C, np.float32)
        y = max(y, 0.0); x = max(x, 0.0)
        y0 = int(y); x0 = int(x)
        if y0 >= H - 1:
            y0 = H - 1; y = float(y0)
        if x0 >= W - 1:
            x0 = W - 1; x = float(x0)
        y1 = min(y0 + 1, H - 1); x1 = min(x0 + 1, W - 1)
        ly = y - y0; lx = x - x0
        return (feat_hwc[y0, x0] * (1 - ly) * (1 - lx) +
                feat_hwc[y0, x1] * (1 - ly) * lx +
                feat_hwc[y1, x0] * ly * (1 - lx) +
                feat_hwc[y1, x1] * ly * lx)

    res = np.zeros((len(boxes), out, out, C), np.float32)
    for n, box in enumerate(np.asarray(boxes) * scale):
        x1, y1, x2, y2 = box
        bw = max(x2 - x1, 1.0) / out
        bh = max(y2 - y1, 1.0) / out
        for i in range(out):
            for j in range(out):
                acc = np.zeros(C, np.float32)
                for iy in range(sr):
                    for ix in range(sr):
                        yy = y1 + i * bh + (iy + 0.5) * bh / sr
                        xx = x1 + j * bw + (ix + 0.5) * bw / sr
                        acc += bilinear(yy, xx)
                res[n, i, j] = acc / (sr * sr)
    return res


def _torch_backbone_fpn(sd, img01):
    """torch-core backbone + FPN from the torchvision-named state dict: returns
    the five P2..P6 feature tensors (inference-form BN = FrozenBatchNorm, which
    is also torchvision's train-mode behavior for detection)."""
    import torch
    import torch.nn.functional as F

    from construction_clip_tpu.models.detection import IMAGE_MEAN, IMAGE_STD
    from construction_clip_tpu.models.resnet import STAGES

    def t(k):
        return sd[k].float()

    def cb(x, wk, bnp, stride=1):
        w = t(wk)
        x = F.conv2d(x, w, stride=stride, padding=w.shape[-1] // 2)
        g, b = t(bnp + ".weight"), t(bnp + ".bias")
        m, v = t(bnp + ".running_mean"), t(bnp + ".running_var")
        s = g / torch.sqrt(v + 1e-5)
        return x * s[None, :, None, None] + (b - m * s)[None, :, None, None]

    with torch.no_grad():
        x = (torch.from_numpy(img01).float() - torch.tensor(IMAGE_MEAN)) \
            / torch.tensor(IMAGE_STD)
        x = x.permute(2, 0, 1)[None]
        x = F.relu(cb(x, "backbone.body.conv1.weight", "backbone.body.bn1", 2))
        x = F.max_pool2d(x, 3, 2, 1)
        cs = []
        for s_i, n in enumerate(STAGES):
            for b_i in range(n):
                pre = f"backbone.body.layer{s_i + 1}.{b_i}"
                stride = 2 if (s_i > 0 and b_i == 0) else 1
                out = F.relu(cb(x, pre + ".conv1.weight", pre + ".bn1"))
                out = F.relu(cb(out, pre + ".conv2.weight", pre + ".bn2", stride))
                out = cb(out, pre + ".conv3.weight", pre + ".bn3")
                idn = cb(x, pre + ".downsample.0.weight", pre + ".downsample.1",
                         stride) if pre + ".downsample.0.weight" in sd else x
                x = F.relu(out + idn)
            cs.append(x)
        lat = [F.conv2d(c, t(f"backbone.fpn.inner_blocks.{i}.0.weight"),
                        t(f"backbone.fpn.inner_blocks.{i}.0.bias"))
               for i, c in enumerate(cs)]
        outs = [None] * 4
        prev = lat[3]
        outs[3] = prev
        for i in (2, 1, 0):
            prev = lat[i] + F.interpolate(prev, size=lat[i].shape[-2:],
                                          mode="nearest")
            outs[i] = prev
        ps = [F.conv2d(o, t(f"backbone.fpn.layer_blocks.{i}.0.weight"),
                       t(f"backbone.fpn.layer_blocks.{i}.0.bias"), padding=1)
              for i, o in enumerate(outs)]
        ps.append(F.max_pool2d(ps[3], 1, 2, 0))
    return ps


def _torch_rpn_head(sd, ps):
    """Per-level anchor-ordered (logits [N_l], deltas [N_l,4]) numpy arrays."""
    import torch
    import torch.nn.functional as F

    def t(k):
        return sd[k].float()

    out = []
    with torch.no_grad():
        for p_ in ps:
            tt = F.relu(F.conv2d(p_, t("rpn.head.conv.0.0.weight"),
                                 t("rpn.head.conv.0.0.bias"), padding=1))
            logits = F.conv2d(tt, t("rpn.head.cls_logits.weight"),
                              t("rpn.head.cls_logits.bias"))
            deltas = F.conv2d(tt, t("rpn.head.bbox_pred.weight"),
                              t("rpn.head.bbox_pred.bias"))
            out.append((logits.permute(0, 2, 3, 1).reshape(-1).numpy(),
                        deltas.permute(0, 2, 3, 1).reshape(-1, 4).numpy()))
    return out


def _torch_box_head(sd, pooled_flat):
    """fc6/fc7/cls/bbox of the box head on flattened pooled rois (numpy)."""
    def tn(k):
        return sd[k].float().numpy()

    h6 = np.maximum(pooled_flat @ tn("roi_heads.box_head.fc6.weight").T
                    + tn("roi_heads.box_head.fc6.bias"), 0)
    h7 = np.maximum(h6 @ tn("roi_heads.box_head.fc7.weight").T
                    + tn("roi_heads.box_head.fc7.bias"), 0)
    cls = h7 @ tn("roi_heads.box_predictor.cls_score.weight").T \
        + tn("roi_heads.box_predictor.cls_score.bias")
    reg = h7 @ tn("roi_heads.box_predictor.bbox_pred.weight").T \
        + tn("roi_heads.box_predictor.bbox_pred.bias")
    return cls, reg


def _np_rpn_proposals(sd, ps, *, image_size, pre_nms, post_nms, rpn_nms=0.7):
    """torchvision filter_proposals in numpy: per-level topk -> decode -> clip
    -> small filter -> per-level NMS -> global sort by score, top post_nms."""
    cand = []
    for lvl, (logits, deltas) in enumerate(_torch_rpn_head(sd, ps)):
        anchors = np.asarray(level_anchors(
            ps[lvl].shape[-2], ps[lvl].shape[-1], 4 * 2 ** lvl, ANCHOR_SIZES[lvl]))
        k = min(pre_nms, len(logits))
        top = np.argsort(-logits)[:k]
        boxes = _np_decode(deltas[top], anchors[top], image_size)
        ok = ((boxes[:, 2] - boxes[:, 0]) > 1e-3) & \
             ((boxes[:, 3] - boxes[:, 1]) > 1e-3)
        for s_, b_ in zip(logits[top][ok], boxes[ok]):
            cand.append((s_, b_, lvl))
    proposals = []
    for lvl in range(5):
        lb = np.asarray([b for s_, b, l in cand if l == lvl])
        ls = np.asarray([s_ for s_, b, l in cand if l == lvl])
        if len(lb) == 0:
            continue
        for i in _np_greedy_nms(lb, ls, rpn_nms):
            proposals.append((ls[i], lb[i]))
    proposals.sort(key=lambda x: -x[0])
    return np.asarray([b for _, b in proposals[:post_nms]])


def _np_multiscale_roi_align(ps, rois):
    """LevelMapper + per-level ROIAlign over P2..P5 (numpy)."""
    lvls = np.clip(np.floor(4 + np.log2(
        np.sqrt(np.maximum((rois[:, 2] - rois[:, 0]) *
                           (rois[:, 3] - rois[:, 1]), 1e-12))
        / 224 + 1e-6)), 2, 5).astype(int) - 2
    pooled = np.zeros((len(rois), 7, 7, 256), np.float32)
    feats_np = [p_.permute(0, 2, 3, 1)[0].numpy() for p_ in ps]
    for lvl in range(4):
        rows = np.nonzero(lvls == lvl)[0]
        if len(rows):
            pooled[rows] = _np_roi_align(feats_np[lvl], rois[rows],
                                         1.0 / (4 * 2 ** lvl))
    return pooled


def _torch_ref_detector(sd, img01, *, image_size, pre_nms, post_nms, det_per_img,
                        num_classes=8, rpn_nms=0.7, box_nms=0.5,
                        score_thresh=0.05):
    """Independent full-forward Faster R-CNN reference: torch-core convs for the
    backbone/FPN/RPN heads + numpy proposal filtering / ROIAlign / box head,
    following torchvision GeneralizedRCNN inference semantics step by step
    (the reference serves exactly that model, reference application.py:13-25)."""
    import torch
    import torch.nn.functional as F

    def t(k):
        return sd[k].float()

    ps = _torch_backbone_fpn(sd, img01)
    with torch.no_grad():
        # RPN filtering + multiscale ROIAlign: the SAME helpers the training
        # parity test uses (single source of the reference semantics —
        # divergence between inference- and train-parity references would
        # otherwise be invisible)
        prop_boxes = _np_rpn_proposals(sd, ps, image_size=image_size,
                                       pre_nms=pre_nms, post_nms=post_nms,
                                       rpn_nms=rpn_nms)
        pooled = _np_multiscale_roi_align(ps, prop_boxes)
        flat = pooled.transpose(0, 3, 1, 2).reshape(len(prop_boxes), -1)
        h6 = np.maximum(flat @ t("roi_heads.box_head.fc6.weight").numpy().T
                        + t("roi_heads.box_head.fc6.bias").numpy(), 0)
        h7 = np.maximum(h6 @ t("roi_heads.box_head.fc7.weight").numpy().T
                        + t("roi_heads.box_head.fc7.bias").numpy(), 0)
        cls = h7 @ t("roi_heads.box_predictor.cls_score.weight").numpy().T \
            + t("roi_heads.box_predictor.cls_score.bias").numpy()
        reg = h7 @ t("roi_heads.box_predictor.bbox_pred.weight").numpy().T \
            + t("roi_heads.box_predictor.bbox_pred.bias").numpy()
        e = np.exp(cls - cls.max(-1, keepdims=True))
        probs = e / e.sum(-1, keepdims=True)

        dets = []
        for c in range(1, num_classes):
            bc = _np_decode(reg[:, c * 4: (c + 1) * 4], prop_boxes, image_size)
            sc = probs[:, c].copy()
            sc[sc <= score_thresh] = 0.0
            sc[((bc[:, 2] - bc[:, 0]) < 1e-2) | ((bc[:, 3] - bc[:, 1]) < 1e-2)] = 0
            live = np.nonzero(sc > 0)[0]
            if not len(live):
                continue
            for i in _np_greedy_nms(bc[live], sc[live], box_nms):
                dets.append((sc[live][i], bc[live][i], c))
        dets.sort(key=lambda x: -x[0])
        return dets[:det_per_img]


def test_full_forward_parity():
    """END-TO-END detector parity: our jitted fasterrcnn_infer vs the independent
    torch-core + numpy reference above, same synthetic torchvision weights, same
    image — final boxes/scores/labels must agree (VERDICT round-1 item 4)."""
    sd = _synthetic_tv_state_dict(seed=3)
    params = from_torchvision_state_dict(sd, num_classes=8)
    rng = np.random.default_rng(5)
    img = rng.random((224, 224, 3)).astype(np.float32)

    det = fasterrcnn_infer(params, jnp.asarray(img), image_size=224,
                           pre_nms_topk=200, post_nms_topk=64,
                           detections_per_img=16)
    ours = [(float(s), np.asarray(b), int(l))
            for b, l, s in zip(np.asarray(det.boxes), np.asarray(det.labels),
                               np.asarray(det.scores)) if s > 0]

    ref = _torch_ref_detector(sd, img, image_size=224, pre_nms=200, post_nms=64,
                              det_per_img=16)

    assert len(ours) == len(ref), (len(ours), len(ref))
    assert len(ref) > 0  # the test must actually exercise detections
    for (s_o, b_o, l_o), (s_r, b_r, l_r) in zip(ours, ref):
        assert l_o == l_r
        np.testing.assert_allclose(s_o, s_r, rtol=2e-3, atol=2e-4)
        np.testing.assert_allclose(b_o, b_r, rtol=1e-2, atol=0.25)


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


def test_jax_detector_batch_uint8_matches_direct_fp32():
    """The serving detect_batch path ships UINT8 and casts/scales on device,
    returning one packed [B,N,6] fetch (serve/detector.py). Pin it against
    calling fasterrcnn_infer directly on fp32 images: identical boxes/labels/
    scores through the pack/unpack + original-resolution mapping.

    Local fixed-seed generator (not the session rng fixture): the fixture's
    state depends on suite order, and a draw with zero detections makes the
    parity vacuous."""
    from construction_clip_tpu.serve.detector import JaxDetector

    det = JaxDetector(None, image_size=128)
    staged = (np.random.default_rng(567).random((2, 128, 128, 3)) * 255
              ).astype(np.uint8)
    sizes = [(128, 128), (128, 128)]  # identity mapping back

    got = det.detect_batch(staged, sizes)

    any_detection = False
    for i in range(2):
        ref = fasterrcnn_infer(det.params,
                               jnp.asarray(staged[i], jnp.float32) / 255.0,
                               image_size=128, num_classes=det.num_classes,
                               compute_dtype=det.compute_dtype)
        boxes = np.asarray(ref.boxes)
        labels = np.asarray(ref.labels)
        scores = np.asarray(ref.scores)
        keep = scores > 0
        assert got[i]["labels"] == [int(l) for l in labels[keep]]
        # vmap-vs-unbatched XLA conv scheduling drifts fp32 at ~1e-4; the
        # pack/unpack itself is exact (f32 in, f32 out)
        np.testing.assert_allclose(got[i]["scores"], scores[keep],
                                   rtol=2e-3, atol=2e-4)
        np.testing.assert_allclose(
            np.asarray(got[i]["boxes"], np.float32).reshape(-1, 4),
            boxes[keep], rtol=1e-2, atol=0.25)
        any_detection = any_detection or bool(keep.any())
    assert any_detection  # at least one image must actually exercise the pack

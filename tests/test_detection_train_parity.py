"""Detection TRAINING loss parity vs torchvision numerics (VERDICT r2 item 4).

`train/detection.tv_detection_losses` reproduces the exact four loss terms
torchvision's `fasterrcnn_resnet50_fpn` returns in train mode —
{loss_objectness, loss_rpn_box_reg, loss_classifier, loss_box_reg} — in the
deterministic take-all sampling limit (rpn/box batch_size_per_image >= all
candidates). The reference here is an INDEPENDENT torch-core + numpy
implementation of those formulas (torchvision itself is not in this image),
sharing the backbone/proposal helpers the round-2 inference-parity test
validated (tests/test_detection.py:test_full_forward_parity).

Reference context: the served detector head was trained with exactly these
losses outside the reference repo (reference application.py:13-25).
"""

import numpy as np
import jax.numpy as jnp

from test_detection import (_synthetic_tv_state_dict, _torch_backbone_fpn,
                            _torch_rpn_head, _torch_box_head,
                            _np_rpn_proposals, _np_multiscale_roi_align,
                            _np_decode)
from construction_clip_tpu.models.detection import (level_anchors, ANCHOR_SIZES,
                                                    from_torchvision_state_dict)
from construction_clip_tpu.train.detection import (tv_detection_losses,
                                                   ROI_BOX_REG_WEIGHTS)

IMAGE_SIZE = 64
PRE_NMS = 64
POST_NMS = 32


def _np_iou(a, b):
    x1 = np.maximum(a[:, None, 0], b[None, :, 0])
    y1 = np.maximum(a[:, None, 1], b[None, :, 1])
    x2 = np.minimum(a[:, None, 2], b[None, :, 2])
    y2 = np.minimum(a[:, None, 3], b[None, :, 3])
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    aa = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    ab = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / np.maximum(aa[:, None] + ab[None, :] - inter, 1e-9)


def _np_encode(gt, anchors, weights=(1.0, 1.0, 1.0, 1.0)):
    aw = np.maximum(anchors[:, 2] - anchors[:, 0], 1e-6)
    ah = np.maximum(anchors[:, 3] - anchors[:, 1], 1e-6)
    ax = (anchors[:, 0] + anchors[:, 2]) / 2
    ay = (anchors[:, 1] + anchors[:, 3]) / 2
    gw = np.maximum(gt[:, 2] - gt[:, 0], 1e-6)
    gh = np.maximum(gt[:, 3] - gt[:, 1], 1e-6)
    gx = (gt[:, 0] + gt[:, 2]) / 2
    gy = (gt[:, 1] + gt[:, 3]) / 2
    t = np.stack([(gx - ax) / aw, (gy - ay) / ah,
                  np.log(gw / aw), np.log(gh / ah)], -1)
    return t * np.asarray(weights)


def _np_smooth_l1(x, beta=1.0 / 9):
    ax = np.abs(x)
    return np.where(ax < beta, 0.5 * x * x / beta, ax - 0.5 * beta)


def _ref_train_losses(sd, img01, gt_boxes, gt_labels):
    """The four torchvision train-mode losses, take-all sampling, numpy."""
    ps = _torch_backbone_fpn(sd, img01)

    # ---- RPN: anchor-ordered logits/deltas over all 5 levels
    per_level = _torch_rpn_head(sd, ps)
    logits = np.concatenate([l for l, _ in per_level])
    deltas = np.concatenate([d for _, d in per_level])
    anchors = np.concatenate([
        np.asarray(level_anchors(ps[l].shape[-2], ps[l].shape[-1],
                                 4 * 2 ** l, ANCHOR_SIZES[l]))
        for l in range(5)])

    # Matcher(0.7, 0.3, allow_low_quality=True): argmax rescue per gt
    iou = _np_iou(anchors, gt_boxes)
    best_gt = iou.argmax(1)
    best_iou = iou.max(1)
    labels = np.where(best_iou >= 0.7, 1, np.where(best_iou < 0.3, 0, -1))
    for g in range(len(gt_boxes)):
        a = iou[:, g].argmax()
        labels[a] = 1
        best_gt[a] = iou[a].argmax()
    fg = labels == 1
    bg = labels == 0
    n_sampled = fg.sum() + bg.sum()

    def sigmoid_logp(x):
        return -np.logaddexp(0.0, -x)

    loss_obj = -(sigmoid_logp(logits[fg]).sum()
                 + sigmoid_logp(-logits[bg]).sum()) / n_sampled
    targets = _np_encode(gt_boxes[best_gt], anchors)
    loss_rpn_box = _np_smooth_l1(deltas[fg] - targets[fg]).sum() / n_sampled

    # ---- ROI: proposals (train top-k) ++ gt; Matcher(0.5, 0.5, no rescue)
    props = _np_rpn_proposals(sd, ps, image_size=IMAGE_SIZE, pre_nms=PRE_NMS,
                              post_nms=POST_NMS)
    rois = np.concatenate([props, gt_boxes])
    riou = _np_iou(rois, gt_boxes)
    r_best_gt = riou.argmax(1)
    r_best_iou = riou.max(1)
    r_fg = r_best_iou >= 0.5
    labels_cls = np.where(r_fg, gt_labels[r_best_gt], 0)

    pooled = _np_multiscale_roi_align(ps, rois)
    flat = pooled.transpose(0, 3, 1, 2).reshape(len(rois), -1)
    cls, reg = _torch_box_head(sd, flat)

    logp = cls - np.log(np.exp(cls - cls.max(-1, keepdims=True)).sum(-1,
                        keepdims=True)) - cls.max(-1, keepdims=True)
    loss_cls = -logp[np.arange(len(rois)), labels_cls].mean()

    roi_targets = _np_encode(gt_boxes[r_best_gt], rois,
                             weights=ROI_BOX_REG_WEIGHTS)
    reg = reg.reshape(len(rois), -1, 4)
    sel = reg[np.arange(len(rois)), labels_cls]
    loss_box = _np_smooth_l1(sel[r_fg] - roi_targets[r_fg]).sum() / len(rois)

    return {"loss_objectness": loss_obj, "loss_rpn_box_reg": loss_rpn_box,
            "loss_classifier": loss_cls, "loss_box_reg": loss_box,
            "n_proposals": len(props), "n_fg_anchors": int(fg.sum()),
            "n_fg_rois": int(r_fg.sum())}


def test_tv_training_loss_parity():
    sd = _synthetic_tv_state_dict(seed=3)
    params = from_torchvision_state_dict(sd, num_classes=8)
    rng = np.random.default_rng(11)
    img = rng.random((IMAGE_SIZE, IMAGE_SIZE, 3)).astype(np.float32)
    gt_boxes = np.asarray([[6.0, 8.0, 30.0, 28.0], [20.0, 34.0, 58.0, 60.0]],
                          np.float32)
    gt_labels = np.asarray([2, 5], np.int32)

    ref = _ref_train_losses(sd, img, gt_boxes, gt_labels)
    assert ref["n_fg_rois"] >= 2  # at least the appended gts are fg
    assert ref["n_proposals"] > 0

    # ours: pad gt to 3 rows (padding must not change any loss)
    pb = np.concatenate([gt_boxes, np.zeros((1, 4), np.float32)])
    pl = np.concatenate([gt_labels, np.zeros((1,), np.int32)])
    ours = tv_detection_losses(params, jnp.asarray(img), jnp.asarray(pb),
                               jnp.asarray(pl), image_size=IMAGE_SIZE,
                               num_classes=8, pre_nms_topk=PRE_NMS,
                               post_nms_topk=POST_NMS)
    for k in ("loss_objectness", "loss_rpn_box_reg", "loss_classifier",
              "loss_box_reg"):
        np.testing.assert_allclose(float(ours[k]), ref[k], rtol=2e-3, atol=2e-4,
                                   err_msg=k)


def test_tv_loss_bf16_backbone_trains():
    """compute_dtype=bf16 (mixed precision: fp32 master params, bf16 backbone
    compute, fp32 feature maps and losses) produces finite losses in the same
    ballpark as fp32 and nonzero fp32 gradients through the cast. Exact parity
    is fp32-only (the torchvision contract above)."""
    import jax

    from construction_clip_tpu.train.detection import (DetectionBatch,
                                                       detection_loss)

    sd = _synthetic_tv_state_dict(seed=3)
    params = from_torchvision_state_dict(sd, num_classes=8)
    rng = np.random.default_rng(11)
    img = rng.random((IMAGE_SIZE, IMAGE_SIZE, 3)).astype(np.float32)
    pb = jnp.asarray([[6.0, 8.0, 30.0, 28.0], [20.0, 34.0, 58.0, 60.0],
                      [0.0, 0.0, 0.0, 0.0]], jnp.float32)
    pl = jnp.asarray([2, 5, 0], jnp.int32)

    f32 = tv_detection_losses(params, jnp.asarray(img), pb, pl,
                              image_size=IMAGE_SIZE, num_classes=8,
                              pre_nms_topk=PRE_NMS, post_nms_topk=POST_NMS)
    b16 = tv_detection_losses(params, jnp.asarray(img), pb, pl,
                              image_size=IMAGE_SIZE, num_classes=8,
                              pre_nms_topk=PRE_NMS, post_nms_topk=POST_NMS,
                              compute_dtype=jnp.bfloat16)
    for k, v in b16.items():
        assert np.isfinite(float(v)), k
        assert float(v) <= 10 * float(f32[k]) + 1.0, (k, float(v), float(f32[k]))

    batch = DetectionBatch(images=jnp.asarray(img)[None],
                           gt_boxes=pb[None], gt_labels=pl[None])

    def loss_fn(p):
        return detection_loss(p, batch, jax.random.key(0),
                              image_size=IMAGE_SIZE, num_classes=8,
                              compute_dtype=jnp.bfloat16)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    g = grads["backbone"]["stem"]["conv"]
    assert g.dtype == jnp.float32  # master-weight grads stay fp32
    assert float(jnp.abs(g).max()) > 0

"""Faster R-CNN training: anchor matching, balanced sampling, RPN + ROI losses.

The reference's detector is an external artifact ('model_final.pth') trained with
torchvision's loop outside the repo (reference application.py:13-25) — a user
switching to this framework needs to (re)train the 7-class construction head, so
training is provided here, static-shape throughout:

  match_anchors   IoU matching with torchvision's thresholds (RPN fg>=0.7 / bg<0.3,
                  low-quality-match rescue for best-anchor-per-gt; box head fg>=0.5)
  sample_balanced fixed-size fg/bg sampling via randomized top-k (no dynamic shapes)
  rpn_loss        sampled BCE objectness + smooth-L1 on encoded deltas
  roi_loss        CE over classes + per-class smooth-L1 on fg rows
  make_detection_train_step  one jitted step over the full model (backbone+FPN
                  trainable; BN is inference-form scale/shift, i.e. frozen stats —
                  torchvision's default for detection fine-tune)

GT comes padded: boxes [B, max_gt, 4], labels [B, max_gt] (0 = padding).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from construction_clip_tpu.models.detection import (
    ANCHOR_SIZES, ASPECT_RATIOS, IMAGE_MEAN, IMAGE_STD, box_iou, level_anchors,
    resnet_pyramid, fpn_forward, roi_align_multilevel, decode_boxes)


def encode_boxes(boxes, anchors):
    """Inverse of decode_boxes: gt boxes + anchors -> regression targets."""
    ax = (anchors[:, 0] + anchors[:, 2]) * 0.5
    ay = (anchors[:, 1] + anchors[:, 3]) * 0.5
    aw = jnp.maximum(anchors[:, 2] - anchors[:, 0], 1e-6)
    ah = jnp.maximum(anchors[:, 3] - anchors[:, 1], 1e-6)
    gx = (boxes[:, 0] + boxes[:, 2]) * 0.5
    gy = (boxes[:, 1] + boxes[:, 3]) * 0.5
    gw = jnp.maximum(boxes[:, 2] - boxes[:, 0], 1e-6)
    gh = jnp.maximum(boxes[:, 3] - boxes[:, 1], 1e-6)
    return jnp.stack([(gx - ax) / aw, (gy - ay) / ah,
                      jnp.log(gw / aw), jnp.log(gh / ah)], axis=-1)


def match_anchors(anchors, gt_boxes, gt_valid, *, fg_thresh: float,
                  bg_thresh: float, rescue_best: bool = True):
    """-> (matched_gt_idx [N], labels [N]: 1 fg / 0 bg / -1 ignore)."""
    iou = box_iou(anchors, gt_boxes)               # [N, max_gt]
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    best_gt = jnp.argmax(iou, axis=1)
    best_iou = jnp.max(iou, axis=1)
    labels = jnp.where(best_iou >= fg_thresh, 1,
                       jnp.where(best_iou < bg_thresh, 0, -1))
    if rescue_best:
        # every valid gt keeps its best anchor as fg even below threshold
        best_anchor_per_gt = jnp.argmax(iou, axis=0)           # [max_gt]
        rescue = jnp.zeros(anchors.shape[0], bool).at[best_anchor_per_gt].set(gt_valid)
        labels = jnp.where(rescue, 1, labels)
        best_gt = jnp.where(rescue, jnp.argmax(iou + 1e-6, axis=1), best_gt)
    return best_gt, labels


def sample_balanced(labels, key, *, num: int, fg_fraction: float):
    """Fixed-size sample mask: up to num*fg_fraction fg, rest bg — randomized
    top-k keeps shapes static (torchvision samples 256 @ 0.5 for RPN, 512 @ 0.25
    for the box head)."""
    n_fg = int(num * fg_fraction)
    kf, kb = jax.random.split(key)
    fg_score = jnp.where(labels == 1, jax.random.uniform(kf, labels.shape), -1.0)
    _, fg_idx = jax.lax.top_k(fg_score, n_fg)
    fg_take = jnp.take(labels, fg_idx) == 1
    bg_score = jnp.where(labels == 0, jax.random.uniform(kb, labels.shape), -1.0)
    _, bg_idx = jax.lax.top_k(bg_score, num - n_fg)
    bg_take = jnp.take(labels, bg_idx) == 0
    return fg_idx, fg_take, bg_idx, bg_take


def smooth_l1(x, beta: float = 1.0 / 9):
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * x * x / beta, ax - 0.5 * beta)


class DetectionBatch(NamedTuple):
    images: jax.Array    # [B, S, S, 3] float [0,1]
    gt_boxes: jax.Array  # [B, max_gt, 4]
    gt_labels: jax.Array  # [B, max_gt] int32, 0 = padding


def _pyramid_fp32(params, x, compute_dtype):
    """Backbone + FPN in `compute_dtype` (bf16 = mixed precision: fp32 master
    params cast at use, fp32 feature maps out so every downstream loss/box
    term is numerically unchanged; autodiff through the casts yields fp32
    grads). None/fp32 = the bit-parity path the torchvision tests pin."""
    if compute_dtype is not None and jnp.dtype(compute_dtype) != jnp.float32:
        cast = lambda t: jax.tree.map(
            lambda z: z.astype(compute_dtype)
            if jnp.issubdtype(z.dtype, jnp.floating) else z, t)
        c = resnet_pyramid(cast(params["backbone"]), x.astype(compute_dtype))
        p = fpn_forward(cast(params["fpn"]), c)
        return [f.astype(jnp.float32) for f in p]
    return fpn_forward(params["fpn"], resnet_pyramid(params["backbone"], x))


def detection_loss(params, batch: DetectionBatch, key, *, image_size: int,
                   num_classes: int, compute_dtype=None):
    """Full-model loss for one step: mean over the batch of RPN + ROI losses.
    ROI head trains on gt boxes as proposals (clean-proposal regime — simple and
    stable for few-class fine-tunes; proposal mixing can be added later)."""
    x = (batch.images - jnp.asarray(IMAGE_MEAN)) / jnp.asarray(IMAGE_STD)
    p_feats = _pyramid_fp32(params, x, compute_dtype)

    anchors = jnp.concatenate([
        level_anchors(f.shape[1], f.shape[2], 4 * (2 ** lvl), ANCHOR_SIZES[lvl])
        for lvl, f in enumerate(p_feats)])

    # RPN head over all levels
    from construction_clip_tpu.models.detection import _conv

    logits_all, deltas_all = [], []
    for f in p_feats:
        t = jax.nn.relu(_conv(f, params["rpn"]["conv"]["w"]) + params["rpn"]["conv"]["b"])
        logits_all.append((t @ params["rpn"]["cls"]["w"] + params["rpn"]["cls"]["b"])
                          .reshape(f.shape[0], -1))
        deltas_all.append((t @ params["rpn"]["bbox"]["w"] + params["rpn"]["bbox"]["b"])
                          .reshape(f.shape[0], -1, 4))
    obj_logits = jnp.concatenate(logits_all, axis=1)    # [B, N]
    obj_deltas = jnp.concatenate(deltas_all, axis=1)    # [B, N, 4]

    def per_image(logits, deltas, gt_boxes, gt_labels, key, p_feats_img):
        valid = gt_labels > 0
        k1, k2 = jax.random.split(key)
        # --- RPN
        gt_idx, alabels = match_anchors(anchors, gt_boxes, valid,
                                        fg_thresh=0.7, bg_thresh=0.3)
        fg_idx, fg_take, bg_idx, bg_take = sample_balanced(
            alabels, k1, num=256, fg_fraction=0.5)
        obj = jax.nn.log_sigmoid(logits)
        nobj = jax.nn.log_sigmoid(-logits)
        cls_loss = -(jnp.sum(jnp.take(obj, fg_idx) * fg_take)
                     + jnp.sum(jnp.take(nobj, bg_idx) * bg_take))
        n_sampled = jnp.maximum(jnp.sum(fg_take) + jnp.sum(bg_take), 1.0)
        cls_loss = cls_loss / n_sampled
        targets = encode_boxes(gt_boxes[gt_idx], anchors)
        reg = smooth_l1(deltas - targets).sum(-1)
        reg_loss = jnp.sum(jnp.take(reg, fg_idx) * fg_take) / n_sampled

        # --- ROI head on gt boxes as proposals
        max_gt = gt_boxes.shape[0]
        pw = jnp.clip(gt_boxes[:, 2] - gt_boxes[:, 0], 1e-6)
        ph = jnp.clip(gt_boxes[:, 3] - gt_boxes[:, 1], 1e-6)
        lvl = jnp.clip(jnp.floor(4 + jnp.log2(jnp.sqrt(pw * ph) / 224 + 1e-6)),
                       2, 5).astype(jnp.int32) - 2
        pooled = roi_align_multilevel(list(p_feats_img)[:4], gt_boxes, lvl,
                                      strides=(4, 8, 16, 32))
        flat = pooled.transpose(0, 3, 1, 2).reshape(max_gt, -1)
        h6 = jax.nn.relu(flat @ params["box_head"]["fc6"]["w"] + params["box_head"]["fc6"]["b"])
        h7 = jax.nn.relu(h6 @ params["box_head"]["fc7"]["w"] + params["box_head"]["fc7"]["b"])
        cls_logits = h7 @ params["box_head"]["cls_score"]["w"] + params["box_head"]["cls_score"]["b"]
        logp = jax.nn.log_softmax(cls_logits.astype(jnp.float32), axis=-1)
        roi_cls = -jnp.take_along_axis(logp, gt_labels[:, None], axis=-1)[:, 0]
        roi_cls = jnp.sum(roi_cls * valid) / jnp.maximum(jnp.sum(valid), 1.0)
        # per-class regression: target deltas are zero (proposals == gt) -> the
        # regressor learns the identity on clean boxes; keep the term so weights
        # receive gradient and stay calibrated
        box_deltas = h7 @ params["box_head"]["bbox_pred"]["w"] + params["box_head"]["bbox_pred"]["b"]
        box_deltas = box_deltas.reshape(max_gt, num_classes, 4)
        sel = jnp.take_along_axis(box_deltas, gt_labels[:, None, None].clip(0), axis=1)[:, 0]
        roi_reg = jnp.sum(smooth_l1(sel).sum(-1) * valid) / jnp.maximum(jnp.sum(valid), 1.0)
        return cls_loss + reg_loss + roi_cls + roi_reg

    losses = []
    # key: scalar PRNG key (split per image here) OR a pre-split [B] key array —
    # the DP path pre-splits over the GLOBAL batch so per-image sampling is
    # identical to single-device regardless of sharding
    keys = jax.random.split(key, batch.images.shape[0]) if key.ndim == 0 else key
    for b in range(batch.images.shape[0]):
        losses.append(per_image(obj_logits[b], obj_deltas[b],
                                batch.gt_boxes[b], batch.gt_labels[b], keys[b],
                                [f[b] for f in p_feats]))
    return jnp.mean(jnp.stack(losses))


ROI_BOX_REG_WEIGHTS = (10.0, 10.0, 5.0, 5.0)  # torchvision BoxCoder default


def tv_detection_losses(params, image, gt_boxes, gt_labels, *, image_size: int,
                        num_classes: int, pre_nms_topk: int = 2000,
                        post_nms_topk: int = 2000, rpn_nms_candidates: int = 2000,
                        compute_dtype=None):
    """Torchvision-faithful training losses for ONE image: the exact four terms
    `fasterrcnn_resnet50_fpn(...).forward(images, targets)` returns in train
    mode — {loss_objectness, loss_rpn_box_reg, loss_classifier, loss_box_reg} —
    computed deterministically by sampling EVERY candidate (the take-all limit
    of torchvision's BalancedPositiveNegativeSampler, i.e. its behavior with
    rpn_batch_size_per_image / box_batch_size_per_image >= the candidate count).

    Semantics per torchvision (models/detection/{rpn,roi_heads}.py):
      RPN: match anchors at fg>=0.7 / bg<0.3 with low-quality rescue;
        objectness = mean BCE over sampled (here: all fg+bg);
        rpn_box_reg = sum smooth_l1(beta=1/9) over fg, encoded vs matched gt
        with unit weights, divided by the sampled count.
      ROI: proposals = filter_proposals(train top-k) ++ gt boxes; match at
        0.5/0.5 NO rescue; classifier = mean CE over sampled (all valid rows);
        box_reg = sum smooth_l1(beta=1/9) over fg rows of the matched class'
        deltas, targets encoded with weights (10,10,5,5), divided by the
        sampled count.

    image: [S,S,3] float in [0,1]; gt_boxes [G,4]; gt_labels [G] (0 = padding).
    Static shapes throughout; the masked/padded rows never contribute.
    Divergence notes (PARITY.md): rescue assigns the single argmax anchor per
    gt (torchvision rescues IoU ties — measure-zero with continuous scores);
    NMS suppression considers the top rpn_nms_candidates candidates only.
    """
    from construction_clip_tpu.models.detection import (_conv, rpn_propose,
                                                        IMAGE_MEAN, IMAGE_STD)

    x = (image - jnp.asarray(IMAGE_MEAN)) / jnp.asarray(IMAGE_STD)
    p_feats = _pyramid_fp32(params, x[None], compute_dtype)
    gt_valid = gt_labels > 0

    # ---- RPN heads over all levels (anchor-ordered, pre-topk)
    anchors = jnp.concatenate([
        level_anchors(f.shape[1], f.shape[2], 4 * (2 ** lvl), ANCHOR_SIZES[lvl])
        for lvl, f in enumerate(p_feats)])
    logits_all, deltas_all = [], []
    for f in p_feats:
        t = jax.nn.relu(_conv(f, params["rpn"]["conv"]["w"]) + params["rpn"]["conv"]["b"])
        logits_all.append((t @ params["rpn"]["cls"]["w"] + params["rpn"]["cls"]["b"])
                          .reshape(-1))
        deltas_all.append((t @ params["rpn"]["bbox"]["w"] + params["rpn"]["bbox"]["b"])
                          .reshape(-1, 4))
    obj_logits = jnp.concatenate(logits_all)       # [N]
    obj_deltas = jnp.concatenate(deltas_all)       # [N, 4]

    gt_idx, alabels = match_anchors(anchors, gt_boxes, gt_valid,
                                    fg_thresh=0.7, bg_thresh=0.3)
    fg = (alabels == 1).astype(jnp.float32)
    bg = (alabels == 0).astype(jnp.float32)
    n_sampled = jnp.maximum(fg.sum() + bg.sum(), 1.0)
    obj = jax.nn.log_sigmoid(obj_logits)
    nobj = jax.nn.log_sigmoid(-obj_logits)
    loss_objectness = -(jnp.sum(obj * fg) + jnp.sum(nobj * bg)) / n_sampled
    rpn_targets = encode_boxes(gt_boxes[gt_idx], anchors)
    loss_rpn_box_reg = jnp.sum(smooth_l1(obj_deltas - rpn_targets).sum(-1) * fg) \
        / n_sampled

    # ---- proposals (training top-k) ++ gt boxes, matched at 0.5 (no rescue).
    # stop_gradient: torchvision decodes proposals from
    # pred_bbox_deltas.detach() (rpn.py RegionProposalNetwork.forward), so ROI
    # losses never backprop into the RPN head through proposal coordinates —
    # the RPN trains only from its own objectness/box losses above
    proposals, keep = rpn_propose(
        params, p_feats, image_size=image_size, pre_nms_topk=pre_nms_topk,
        post_nms_topk=post_nms_topk, rpn_nms_candidates=rpn_nms_candidates)
    proposals = jax.lax.stop_gradient(proposals)
    keep = jax.lax.stop_gradient(keep)
    rois = jnp.concatenate([proposals, gt_boxes])            # [R, 4]
    row_valid = jnp.concatenate([keep, gt_valid]).astype(jnp.float32)
    _, max_gt = proposals.shape[0], gt_boxes.shape[0]
    iou = box_iou(rois, gt_boxes)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    best_gt = jnp.argmax(iou, axis=1)
    best_iou = jnp.max(iou, axis=1)
    roi_fg = (best_iou >= 0.5) & (row_valid > 0)
    labels_cls = jnp.where(roi_fg, gt_labels[best_gt], 0)

    # ---- box head on pooled rois (level mapper + roi_align, as in inference)
    pw = jnp.clip(rois[:, 2] - rois[:, 0], 1e-6)
    ph = jnp.clip(rois[:, 3] - rois[:, 1], 1e-6)
    lvl_assign = jnp.clip(jnp.floor(4 + jnp.log2(jnp.sqrt(pw * ph) / 224 + 1e-6)),
                          2, 5).astype(jnp.int32) - 2
    pooled = roi_align_multilevel([p_feats[l][0] for l in range(4)], rois,
                                  lvl_assign, strides=(4, 8, 16, 32))
    flat = pooled.transpose(0, 3, 1, 2).reshape(rois.shape[0], -1)
    h6 = jax.nn.relu(flat @ params["box_head"]["fc6"]["w"] + params["box_head"]["fc6"]["b"])
    h7 = jax.nn.relu(h6 @ params["box_head"]["fc7"]["w"] + params["box_head"]["fc7"]["b"])
    cls_logits = h7 @ params["box_head"]["cls_score"]["w"] + params["box_head"]["cls_score"]["b"]
    box_deltas = (h7 @ params["box_head"]["bbox_pred"]["w"]
                  + params["box_head"]["bbox_pred"]["b"]).reshape(
                      rois.shape[0], num_classes, 4)

    n_rois = jnp.maximum(row_valid.sum(), 1.0)
    logp = jax.nn.log_softmax(cls_logits.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(logp, labels_cls[:, None], axis=-1)[:, 0]
    loss_classifier = jnp.sum(ce * row_valid) / n_rois

    roi_targets = encode_boxes(gt_boxes[best_gt], rois) \
        * jnp.asarray(ROI_BOX_REG_WEIGHTS)
    sel = jnp.take_along_axis(box_deltas, labels_cls[:, None, None].clip(0),
                              axis=1)[:, 0]
    loss_box_reg = jnp.sum(smooth_l1(sel - roi_targets).sum(-1)
                           * roi_fg.astype(jnp.float32)) / n_rois

    return {"loss_objectness": loss_objectness,
            "loss_rpn_box_reg": loss_rpn_box_reg,
            "loss_classifier": loss_classifier,
            "loss_box_reg": loss_box_reg}


def make_detection_train_step(tx, *, image_size: int, num_classes: int,
                              mesh=None, tv_faithful: bool = False,
                              tv_post_nms_topk: int = 512,
                              compute_dtype=None):
    """Single-device by default; with a mesh whose "data" axis > 1, the batch
    shards over chips (shard_map) with pmean'd grads/loss — same DP recipe as
    train/contrastive.py (per-image losses are independent, so DP mean == the
    single-device batch mean).

    tv_faithful=True trains on the sum of the four torchvision train-mode loss
    terms (tv_detection_losses: RPN-proposal ROI regime, take-all sampling,
    deterministic — pinned against torch numerics in
    tests/test_detection_train_parity.py) instead of the default fast
    clean-proposal loss. Costlier per step (runs proposal NMS in the loss) but
    numerically the torchvision objective."""
    from construction_clip_tpu.core.mesh import DATA_AXIS

    n_data = 1 if mesh is None else mesh.shape[DATA_AXIS]

    def tv_batch_loss(p, batch):
        losses = [tv_detection_losses(
            p, batch.images[i], batch.gt_boxes[i], batch.gt_labels[i],
            image_size=image_size, num_classes=num_classes,
            pre_nms_topk=tv_post_nms_topk * 2, post_nms_topk=tv_post_nms_topk,
            compute_dtype=compute_dtype)
            for i in range(batch.images.shape[0])]
        return jnp.mean(jnp.stack([sum(l.values()) for l in losses]))

    def sharded_step(state, images, gt_boxes, gt_labels, keys):
        from construction_clip_tpu.train.state import apply_gradients

        batch = DetectionBatch(images=images, gt_boxes=gt_boxes,
                               gt_labels=gt_labels)
        if tv_faithful:
            loss_fn = lambda p: tv_batch_loss(p, batch)
        else:
            loss_fn = lambda p: detection_loss(p, batch, keys,
                                               image_size=image_size,
                                               num_classes=num_classes,
                                               compute_dtype=compute_dtype)
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        if n_data > 1:
            grads = jax.lax.pmean(grads, DATA_AXIS)
            loss = jax.lax.pmean(loss, DATA_AXIS)
        return apply_gradients(state, grads, tx), {"loss": loss}

    if n_data > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from jax import shard_map

        inner = shard_map(
            sharded_step, mesh=mesh,
            in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
            out_specs=(P(), P()),
            check_vma=False,
        )

        @functools.partial(
            jax.jit,
            out_shardings=(NamedSharding(mesh, P()), NamedSharding(mesh, P())),
            donate_argnums=(0,))
        def step(state, batch: DetectionBatch, key):
            # split per-image keys over the GLOBAL batch, then shard them
            keys = jax.random.split(key, batch.images.shape[0])
            return inner(state, batch.images, batch.gt_boxes, batch.gt_labels,
                         keys)

        return step

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state, batch: DetectionBatch, key):
        return sharded_step(state, batch.images, batch.gt_boxes,
                            batch.gt_labels, key)  # scalar key: split in loss

    return step

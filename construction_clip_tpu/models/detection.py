"""Faster R-CNN (ResNet50-FPN) object detector, functional JAX, static shapes.

The reference serves torchvision `fasterrcnn_resnet50_fpn` with a custom 8-class head
('model_final.pth', reference application.py:13-25,51-70) for the construction-object
classes (labels.json). This is the TPU-native detector behind serve/detector.py:

  backbone   ResNet-50 C2..C5 (models/resnet.py stages) -> FPN P2..P5 (+P6 pool)
  rpn        shared 3x3 conv head, 3 anchors/location (one scale per level x 3
             aspects, torchvision's scheme), static top-k pre-NMS, batched-iota NMS
  roi        level assignment (FPN paper eq.1), ROIAlign 7x7 (sampling_ratio 2,
             aligned=False like torchvision's default roi_align), 2xFC-1024 head,
             class scores + per-class box regression, per-class NMS

Everything is fixed-shape (top-k + masking instead of dynamic filtering) so the whole
detector jits as one program. Converter consumes torchvision state_dict naming (both
old `inner_blocks.{i}.weight` and new `.{i}.0.weight` layouts).

Inference-only in round 1 (the reference's detector is also a frozen serving artifact).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from construction_clip_tpu.models.resnet import _conv, _bn, _bottleneck, WIDTHS

# torchvision defaults
ANCHOR_SIZES = (32, 64, 128, 256, 512)  # one per level P2..P6
ASPECT_RATIOS = (0.5, 1.0, 2.0)
IMAGE_MEAN = (0.485, 0.456, 0.406)
IMAGE_STD = (0.229, 0.224, 0.225)


# ---------------------------------------------------------------- backbone/FPN

def resnet_pyramid(params, images):
    """images [B,H,W,3] -> (C2, C3, C4, C5) NHWC feature maps."""
    x = jax.nn.relu(_bn(_conv(images, params["stem"]["conv"], stride=2),
                        params["stem"]["bn"]))
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
    x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
                              "VALID")
    feats = []
    for s, blocks in enumerate(params["stages"]):
        for b, bp in enumerate(blocks):
            x = _bottleneck(x, bp, 2 if (s > 0 and b == 0) else 1)
        feats.append(x)
    return tuple(feats)  # C2..C5, strides 4, 8, 16, 32


def fpn_forward(fpn_params, c_feats):
    """C2..C5 -> P2..P6 (channels 256; P6 = stride-2 maxpool of P5)."""
    laterals = [c @ fpn_params["inner"][i]["w"] + fpn_params["inner"][i]["b"]
                for i, c in enumerate(c_feats)]
    outs = [None] * 4
    prev = laterals[-1]
    outs[3] = prev
    for i in (2, 1, 0):
        up = jax.image.resize(prev, laterals[i].shape, method="nearest")
        prev = laterals[i] + up
        outs[i] = prev
    ps = [_conv(outs[i], fpn_params["layer"][i]["w"]) + fpn_params["layer"][i]["b"]
          for i in range(4)]
    p6 = jax.lax.reduce_window(ps[3], -jnp.inf, jax.lax.max,
                               (1, 1, 1, 1), (1, 2, 2, 1), "VALID")
    return ps + [p6]  # P2..P6


# --------------------------------------------------------------------- anchors

def level_anchors(h: int, w: int, stride: int, size: float):
    """[h*w*3, 4] xyxy anchors for one level (torchvision AnchorGenerator math:
    per cell, 3 aspect ratios of one base size, centered on cell*stride)."""
    anchors = []
    for ar in ASPECT_RATIOS:
        h_r = np.sqrt(ar)
        aw = size / h_r
        ah = size * h_r
        anchors.append([-aw / 2, -ah / 2, aw / 2, ah / 2])
    base = np.asarray(anchors, np.float32)  # [3, 4]
    ys = (np.arange(h, dtype=np.float32)) * stride
    xs = (np.arange(w, dtype=np.float32)) * stride
    shift_x, shift_y = np.meshgrid(xs, ys)
    shifts = np.stack([shift_x, shift_y, shift_x, shift_y], axis=-1).reshape(-1, 1, 4)
    return jnp.asarray((shifts + base[None]).reshape(-1, 4))


# --------------------------------------------------------------- box utilities

def decode_boxes(deltas, anchors, *, clip_hw=None):
    """torchvision BoxCoder.decode: deltas [N,4] (dx,dy,dw,dh) on anchors xyxy."""
    ax = (anchors[:, 0] + anchors[:, 2]) * 0.5
    ay = (anchors[:, 1] + anchors[:, 3]) * 0.5
    aw = anchors[:, 2] - anchors[:, 0]
    ah = anchors[:, 3] - anchors[:, 1]
    dx, dy, dw, dh = deltas[:, 0], deltas[:, 1], deltas[:, 2], deltas[:, 3]
    dw = jnp.clip(dw, None, np.log(1000.0 / 16))
    dh = jnp.clip(dh, None, np.log(1000.0 / 16))
    cx = dx * aw + ax
    cy = dy * ah + ay
    w = jnp.exp(dw) * aw
    h = jnp.exp(dh) * ah
    boxes = jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)
    if clip_hw is not None:
        H, W = clip_hw
        boxes = jnp.stack([
            jnp.clip(boxes[:, 0], 0, W), jnp.clip(boxes[:, 1], 0, H),
            jnp.clip(boxes[:, 2], 0, W), jnp.clip(boxes[:, 3], 0, H)], axis=-1)
    return boxes


def box_iou(a, b):
    """[N,4] x [M,4] -> [N,M] IoU."""
    area_a = jnp.clip(a[:, 2] - a[:, 0], 0) * jnp.clip(a[:, 3] - a[:, 1], 0)
    area_b = jnp.clip(b[:, 2] - b[:, 0], 0) * jnp.clip(b[:, 3] - b[:, 1], 0)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / jnp.maximum(area_a[:, None] + area_b[None] - inter, 1e-6)


def nms_mask(boxes, scores, *, iou_threshold: float, max_out: int,
             num_candidates: int | None = None):
    """Static-shape greedy NMS. Returns (indices [max_out] into boxes, keep_mask
    [max_out]), survivors compacted to the front in descending-score order.

    Suppression runs over the top `num_candidates` boxes (default: ALL, matching
    torchvision's nms-then-truncate semantics — survivors beyond the early ones
    refill the output when high scorers suppress each other); `max_out` only
    sizes the output."""
    n = boxes.shape[0]
    k = n if num_candidates is None else min(num_candidates, n)
    order = jnp.argsort(-scores)[:k]
    boxes_s = boxes[order]
    scores_s = scores[order]
    iou = box_iou(boxes_s, boxes_s)

    # Greedy NMS as an antitone fixed-point instead of a k-step sequential
    # loop: the greedy solution is the unique fixed point of
    #   F(alive)[j] = not exists i<j: alive[i] and iou[i,j] > thr,
    # and F is antitone (more survivors -> more suppression), so iterating
    # from all-alive sandwiches the solution (odd iterates under-, even
    # iterates over-approximate) and terminates exactly when a_{t+1} == a_t.
    # Each iteration is ONE [k, k] masked any-reduce (VPU-parallel) instead of
    # one row per sequential step — a 2000-candidate RPN NMS converges in
    # ~chain-depth (<~20) iterations rather than 2000 data-dependent
    # fori_loop trips. Worst case (a suppression chain) still terminates at
    # the exact greedy answer in <= k iterations.
    valid = scores_s > -jnp.inf
    # suppressor relation: i may kill j (strictly lower-scored, IoU above thr)
    strict = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0) < \
        jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    kill = (iou > iou_threshold) & strict & valid[:, None]

    def fx_cond(s):
        a, prev, it = s
        return jnp.any(a != prev) & (it < k)

    def fx_body(s):
        a, _, it = s
        nxt = valid & ~jnp.any(kill & a[:, None], axis=0)
        return nxt, a, it + 1

    alive, _, _ = jax.lax.while_loop(
        fx_cond, fx_body,
        (valid & ~jnp.any(kill, axis=0), valid, jnp.zeros((), jnp.int32)))

    m = min(max_out, k)
    rank = jnp.cumsum(alive) - 1                    # survivor rank per candidate
    slot = jnp.where(alive & (rank < m), rank, m)   # dead / overflow -> sentinel
    compact = jnp.zeros((m + 1,), jnp.int32).at[slot].set(
        jnp.arange(k, dtype=jnp.int32))
    idx = order[compact[:m]]
    keep = jnp.arange(m) < jnp.minimum(jnp.sum(alive), m)
    if m < max_out:
        idx = jnp.pad(idx, (0, max_out - m))
        keep = jnp.pad(keep, (0, max_out - m))
    return idx, keep


# ------------------------------------------------------------------- ROIAlign

def roi_align(feat, boxes, *, out_size: int = 7, spatial_scale: float,
              sampling_ratio: int = 2):
    """feat [H,W,C]; boxes [N,4] xyxy in image coords -> [N, out, out, C].
    Bilinear sampling on a sampling_ratio x sampling_ratio grid per output bin,
    averaged — torchvision roi_align with aligned=False (the Detectron-legacy
    convention the detection models are trained with: no half-pixel offset,
    sample coords clamped at 0, points outside [-1, size] contribute zero)."""
    H, W, C = feat.shape
    boxes = boxes * spatial_scale
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    bw = jnp.maximum(x2 - x1, 1.0)
    bh = jnp.maximum(y2 - y1, 1.0)
    bin_w = bw / out_size
    bin_h = bh / out_size

    s = sampling_ratio
    # sample offsets within each bin: (i + (j + .5)/s) for j in range(s)
    grid = (jnp.arange(s) + 0.5) / s

    def axis_weights(coords, size):
        """coords [K] -> (lo_idx, hi_idx, frac, in_range) per torchvision
        bilinear_interpolate: clamp at 0; rows past size-1 collapse (frac 0);
        coords < -1 or > size are zeroed."""
        in_range = (coords >= -1.0) & (coords <= size)
        c = jnp.clip(coords, 0.0, None)
        lo = jnp.minimum(jnp.floor(c), size - 1)
        frac = jnp.where(lo >= size - 1, 0.0, c - lo)
        lo_i = lo.astype(jnp.int32)
        hi_i = jnp.minimum(lo_i + 1, size - 1)
        return lo_i, hi_i, frac, in_range

    def sample_box(bx1, by1, bbin_w, bbin_h):
        ys = by1 + (jnp.arange(out_size)[:, None] + grid[None, :]) * bbin_h  # [7,s]
        xs = bx1 + (jnp.arange(out_size)[:, None] + grid[None, :]) * bbin_w
        ys = ys.reshape(-1)  # [7*s]
        xs = xs.reshape(-1)

        y0i, y1i, ly, ok_y = axis_weights(ys, H)
        x0i, x1i, lx, ok_x = axis_weights(xs, W)

        # gather 4 corners: [7s, 7s, C] via outer indexing
        f00 = feat[y0i[:, None], x0i[None, :]]
        f01 = feat[y0i[:, None], x1i[None, :]]
        f10 = feat[y1i[:, None], x0i[None, :]]
        f11 = feat[y1i[:, None], x1i[None, :]]
        wy = ly[:, None, None]
        wx = lx[None, :, None]
        val = (f00 * (1 - wy) * (1 - wx) + f01 * (1 - wy) * wx +
               f10 * wy * (1 - wx) + f11 * wy * wx)  # [7s, 7s, C]
        val = val * (ok_y[:, None] & ok_x[None, :])[..., None]
        val = val.reshape(out_size, s, out_size, s, C)
        return val.mean(axis=(1, 3))  # [7, 7, C]

    return jax.vmap(sample_box)(x1, y1, bin_w, bin_h)


def roi_align_multilevel(feats, boxes, lvl_assign, *, strides,
                         out_size: int = 7, sampling_ratio: int = 2):
    """Multi-level ROIAlign as ONE flat gather: feats (list of [H_l,W_l,C],
    e.g. P2..P5), boxes [N,4] xyxy image coords, lvl_assign [N] int32 level
    index per box. Returns [N, out, out, C].

    Numerically identical to running `roi_align` per level and selecting by
    lvl_assign (tests/test_detection.py pins this), but gathers each box's
    samples from its OWN level only: the per-level formulation in round ≤4
    pooled every proposal at every level and masked 3/4 of it away — ROIAlign
    was 119.6 of the 154 ms b=8@512 inference (tools/attr_detection.py). All
    levels concatenate into one [ΣHW, C] row table and the 4 bilinear corners
    are four [N, K, K] row-gathers with per-box level offsets; interpolation
    weights stay fp32 (sub-pixel coords), values may be bf16."""
    assert len(feats) == len(strides), (len(feats), len(strides))
    C = feats[0].shape[-1]
    hw = [(f.shape[0], f.shape[1]) for f in feats]
    offs = np.concatenate([[0], np.cumsum([h * w for h, w in hw])]).astype(np.int32)
    flat = jnp.concatenate([f.reshape(-1, C) for f in feats], axis=0)
    dims = jnp.asarray(hw, jnp.int32)                       # [L, 2]
    scale = jnp.asarray([1.0 / s for s in strides])[lvl_assign]   # [N]
    Hl = dims[lvl_assign, 0].astype(jnp.float32)
    Wl = dims[lvl_assign, 1].astype(jnp.float32)
    base = jnp.asarray(offs[:-1], jnp.int32)[lvl_assign]    # [N]

    b = boxes * scale[:, None]
    x1, y1, x2, y2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    bw = jnp.maximum(x2 - x1, 1.0)
    bh = jnp.maximum(y2 - y1, 1.0)
    s = sampling_ratio
    grid = ((jnp.arange(out_size)[:, None] + (jnp.arange(s) + 0.5)[None, :] / s)
            .reshape(-1))                                   # [out*s]
    ys = y1[:, None] + grid[None, :] * (bh / out_size)[:, None]   # [N, out*s]
    xs = x1[:, None] + grid[None, :] * (bw / out_size)[:, None]

    def axis_weights(coords, size):
        """Per-box torchvision bilinear_interpolate semantics (see roi_align)
        with a [N] size vector."""
        sz = size[:, None]
        in_range = (coords >= -1.0) & (coords <= sz)
        c = jnp.clip(coords, 0.0, None)
        lo = jnp.minimum(jnp.floor(c), sz - 1)
        frac = jnp.where(lo >= sz - 1, 0.0, c - lo)
        lo_i = lo.astype(jnp.int32)
        hi_i = jnp.minimum(lo_i + 1, sz.astype(jnp.int32) - 1)
        return lo_i, hi_i, frac, in_range

    y0i, y1i, ly, ok_y = axis_weights(ys, Hl)
    x0i, x1i, lx, ok_x = axis_weights(xs, Wl)
    wl_i = dims[lvl_assign, 1][:, None, None]               # [N,1,1] int32

    def gather(yi, xi):
        idx = base[:, None, None] + yi[:, :, None] * wl_i + xi[:, None, :]
        return flat[idx]                                    # [N, K, K, C]

    f00 = gather(y0i, x0i)
    f01 = gather(y0i, x1i)
    f10 = gather(y1i, x0i)
    f11 = gather(y1i, x1i)
    wy = ly[:, :, None, None]
    wx = lx[:, None, :, None]
    val = (f00 * (1 - wy) * (1 - wx) + f01 * (1 - wy) * wx +
           f10 * wy * (1 - wx) + f11 * wy * wx)
    val = val * (ok_y[:, :, None] & ok_x[:, None, :])[..., None]
    val = val.reshape(val.shape[0], out_size, s, out_size, s, C)
    return val.mean(axis=(2, 4))                            # [N, out, out, C]


# ------------------------------------------------------------------- detector

class Detections(NamedTuple):
    boxes: jax.Array   # [K, 4]
    labels: jax.Array  # [K] int32 (0 = background/empty slot)
    scores: jax.Array  # [K]


def init_fasterrcnn(key, *, num_classes: int = 8, fpn_channels: int = 256,
                    dtype=jnp.float32):
    from construction_clip_tpu.models.resnet import init_resnet50

    ks = iter(jax.random.split(key, 32))

    def lin(i, o, std=0.01):
        return {"w": (jax.random.normal(next(ks), (i, o)) * std).astype(dtype),
                "b": jnp.zeros((o,), dtype)}

    def conv3(i, o):
        return {"w": (jax.random.normal(next(ks), (3, 3, i, o)) * 0.01).astype(dtype),
                "b": jnp.zeros((o,), dtype)}

    a = len(ASPECT_RATIOS)
    return {
        "backbone": init_resnet50(next(ks), dtype),
        "fpn": {
            "inner": [lin(w * 4, fpn_channels) for w in WIDTHS],
            "layer": [conv3(fpn_channels, fpn_channels) for _ in WIDTHS],
        },
        "rpn": {
            "conv": conv3(fpn_channels, fpn_channels),
            "cls": lin(fpn_channels, a),
            "bbox": lin(fpn_channels, a * 4),
        },
        "box_head": {
            "fc6": lin(fpn_channels * 7 * 7, 1024),
            "fc7": lin(1024, 1024),
            "cls_score": lin(1024, num_classes),
            "bbox_pred": lin(1024, num_classes * 4),
        },
    }


def rpn_propose(params, p_feats, *, image_size: int, pre_nms_topk: int,
                post_nms_topk: int, rpn_nms_thresh: float = 0.7,
                rpn_nms_candidates: int = 2000):
    """RPN proposal stage shared by inference and torchvision-faithful training
    (torchvision RegionProposalNetwork.filter_proposals semantics): per-level
    top-k on raw objectness, decode+clip, drop degenerate boxes, per-LEVEL NMS
    (batched_nms via the coordinate-offset trick), keep top post_nms_topk by
    score. Returns (proposals [post_nms_topk, 4], keep mask [post_nms_topk]).

    NMS suppresses over the top rpn_nms_candidates only: the full 5-level
    candidate set would build a quadratic IoU matrix and a long sequential
    loop; results differ from all-candidates NMS only if more than
    (candidates - post_nms_topk) of the top candidates suppress each other."""
    all_scores, all_boxes, all_lvls = [], [], []
    for lvl, feat in enumerate(p_feats):
        stride = 4 * (2 ** lvl)
        h, w = feat.shape[1], feat.shape[2]
        t = jax.nn.relu(_conv(feat, params["rpn"]["conv"]["w"]) +
                        params["rpn"]["conv"]["b"])
        logits = (t @ params["rpn"]["cls"]["w"] + params["rpn"]["cls"]["b"])[0]
        deltas = (t @ params["rpn"]["bbox"]["w"] + params["rpn"]["bbox"]["b"])[0]
        # box math is fp32 regardless of the backbone compute dtype (bf16's
        # 8 mantissa bits resolve ~2px at coord 512)
        logits = logits.reshape(-1).astype(jnp.float32)  # [h*w*a]
        deltas = deltas.reshape(-1, 4).astype(jnp.float32)
        anchors = level_anchors(h, w, stride, ANCHOR_SIZES[lvl])
        # per-level top-k before decode (torchvision does per-level topk)
        k = min(pre_nms_topk, logits.shape[0])
        top_s, top_i = jax.lax.top_k(logits, k)
        boxes = decode_boxes(deltas[top_i], anchors[top_i],
                             clip_hw=(image_size, image_size))
        all_scores.append(top_s)
        all_boxes.append(boxes)
        all_lvls.append(jnp.full((k,), lvl, jnp.float32))
    scores = jnp.concatenate(all_scores)
    boxes = jnp.concatenate(all_boxes)
    lvls = jnp.concatenate(all_lvls)
    # drop degenerate boxes (torchvision remove_small_boxes, min_size 1e-3)
    valid = ((boxes[:, 2] - boxes[:, 0]) > 1e-3) & ((boxes[:, 3] - boxes[:, 1]) > 1e-3)
    scores = jnp.where(valid, scores, -jnp.inf)
    nms_boxes = boxes + (lvls * (image_size + 2.0))[:, None]
    idx, keep = nms_mask(nms_boxes, scores, iou_threshold=rpn_nms_thresh,
                         max_out=post_nms_topk,
                         num_candidates=rpn_nms_candidates)
    return boxes[idx] * keep[:, None], keep


@functools.partial(jax.jit, static_argnames=(
    "image_size", "pre_nms_topk", "post_nms_topk", "detections_per_img",
    "num_classes", "rpn_nms_candidates", "compute_dtype"))
def fasterrcnn_infer(params, image, *, image_size: int = 800,
                     pre_nms_topk: int = 1000, post_nms_topk: int = 300,
                     detections_per_img: int = 100, num_classes: int = 8,
                     rpn_nms_thresh: float = 0.7, box_nms_thresh: float = 0.5,
                     score_thresh: float = 0.05,
                     rpn_nms_candidates: int = 2000,
                     compute_dtype=jnp.float32) -> Detections:
    """image [S,S,3] float in [0,1] (square-staged). Returns fixed-size Detections;
    empty slots have score 0 / label 0.

    compute_dtype: dtype for the conv/GEMM-heavy stages (backbone, FPN, RPN
    convs, box head). bf16 runs them MXU-native on TPU; all BOX arithmetic
    (anchor decode, IoU, NMS, coordinates up to image_size — bf16's 8 mantissa
    bits resolve only ~2px at 512) plus softmax stays fp32: head outputs are
    upcast before any coordinate math, pre-folded BN is a bf16-safe
    scale/shift, and ROIAlign interpolation weights come from fp32 proposal
    coords. torchvision parity tests run fp32 (the reference contract,
    application.py:13-25); bf16 is the serving configuration."""
    cd = jnp.dtype(compute_dtype)
    if cd != jnp.float32:
        def _cast(t):
            return jax.tree.map(
                lambda z: z.astype(cd)
                if jnp.issubdtype(z.dtype, jnp.floating) else z, t)
        params = dict(params,
                      backbone=_cast(params["backbone"]),
                      fpn=_cast(params["fpn"]),
                      rpn=_cast(params["rpn"]),
                      box_head=_cast(params["box_head"]))
        image = image.astype(cd)
    x = (image - jnp.asarray(IMAGE_MEAN, image.dtype)) \
        / jnp.asarray(IMAGE_STD, image.dtype)
    c_feats = resnet_pyramid(params["backbone"], x[None])
    p_feats = fpn_forward(params["fpn"], c_feats)  # P2..P6, batch 1

    proposals, keep = rpn_propose(
        params, p_feats, image_size=image_size, pre_nms_topk=pre_nms_topk,
        post_nms_topk=post_nms_topk, rpn_nms_thresh=rpn_nms_thresh,
        rpn_nms_candidates=rpn_nms_candidates)

    # ---- ROI heads: FPN level assignment (eq.1: k = 4 + log2(sqrt(area)/224))
    pw = jnp.clip(proposals[:, 2] - proposals[:, 0], 1e-6)
    ph = jnp.clip(proposals[:, 3] - proposals[:, 1], 1e-6)
    lvl_assign = jnp.clip(jnp.floor(4 + jnp.log2(jnp.sqrt(pw * ph) / 224 + 1e-6)),
                          2, 5).astype(jnp.int32) - 2     # 0..3 over P2..P5
    pooled = roi_align_multilevel(
        [p_feats[lvl][0] for lvl in range(4)], proposals, lvl_assign,
        strides=(4, 8, 16, 32)).astype(cd)

    # torchvision flattens NCHW (C,7,7) into fc6 — transpose to match its weights
    flat = pooled.transpose(0, 3, 1, 2).reshape(pooled.shape[0], -1)
    h6 = jax.nn.relu(flat @ params["box_head"]["fc6"]["w"] + params["box_head"]["fc6"]["b"])
    h7 = jax.nn.relu(h6 @ params["box_head"]["fc7"]["w"] + params["box_head"]["fc7"]["b"])
    cls_logits = (h7 @ params["box_head"]["cls_score"]["w"]
                  + params["box_head"]["cls_score"]["b"]).astype(jnp.float32)
    box_deltas = (h7 @ params["box_head"]["bbox_pred"]["w"]
                  + params["box_head"]["bbox_pred"]["b"]).astype(jnp.float32)
    probs = jax.nn.softmax(cls_logits, axis=-1)           # [P, num_classes]

    # per-class decode + NMS (class 0 = background)
    final_boxes, final_scores, final_labels = [], [], []
    keep_f = keep.astype(probs.dtype)
    for c in range(1, num_classes):
        deltas_c = box_deltas[:, c * 4: (c + 1) * 4]
        boxes_c = decode_boxes(deltas_c, proposals, clip_hw=(image_size, image_size))
        scores_c = probs[:, c] * keep_f
        scores_c = jnp.where(scores_c > score_thresh, scores_c, 0.0)
        # torchvision remove_small_boxes(min_size=1e-2) before the class NMS
        big = ((boxes_c[:, 2] - boxes_c[:, 0]) >= 1e-2) & \
              ((boxes_c[:, 3] - boxes_c[:, 1]) >= 1e-2)
        scores_c = jnp.where(big, scores_c, 0.0)
        idx_c, keep_c = nms_mask(boxes_c, jnp.where(scores_c > 0, scores_c, -jnp.inf),
                                 iou_threshold=box_nms_thresh,
                                 max_out=detections_per_img)
        final_boxes.append(boxes_c[idx_c])
        final_scores.append(scores_c[idx_c] * keep_c)
        final_labels.append(jnp.full((detections_per_img,), c, jnp.int32))
    fb = jnp.concatenate(final_boxes)
    fs = jnp.concatenate(final_scores)
    fl = jnp.concatenate(final_labels)
    top_s, top_i = jax.lax.top_k(fs, detections_per_img)
    return Detections(boxes=fb[top_i], labels=jnp.where(top_s > 0, fl[top_i], 0),
                      scores=top_s)


# ------------------------------------------------------------------ converter

def from_torchvision_state_dict(sd, *, num_classes: int = 8):
    """torchvision fasterrcnn_resnet50_fpn state dict -> our params."""
    from construction_clip_tpu.models.resnet import (
        from_torchvision_state_dict as resnet_convert)

    def a(k):
        x = sd[k]
        if hasattr(x, "detach"):
            x = x.detach().cpu().numpy()
        return np.asarray(x)

    def pick(*names):
        for n in names:
            if n in sd:
                return n
        raise KeyError(names)

    def lin_from_conv1x1(k_w, k_b):
        w = a(k_w)  # [O, I, 1, 1]
        return {"w": jnp.asarray(w[:, :, 0, 0].T), "b": jnp.asarray(a(k_b))}

    def conv3(k_w, k_b):
        return {"w": jnp.asarray(a(k_w).transpose(2, 3, 1, 0)),
                "b": jnp.asarray(a(k_b))}

    def lin(k_w, k_b):
        return {"w": jnp.asarray(a(k_w).T), "b": jnp.asarray(a(k_b))}

    backbone_sd = {k[len("backbone.body."):]: v for k, v in sd.items()
                   if k.startswith("backbone.body.")}
    inner, layer = [], []
    for i in range(4):
        iw = pick(f"backbone.fpn.inner_blocks.{i}.0.weight",
                  f"backbone.fpn.inner_blocks.{i}.weight")
        ib = pick(f"backbone.fpn.inner_blocks.{i}.0.bias",
                  f"backbone.fpn.inner_blocks.{i}.bias")
        lw = pick(f"backbone.fpn.layer_blocks.{i}.0.weight",
                  f"backbone.fpn.layer_blocks.{i}.weight")
        lb = pick(f"backbone.fpn.layer_blocks.{i}.0.bias",
                  f"backbone.fpn.layer_blocks.{i}.bias")
        inner.append(lin_from_conv1x1(iw, ib))
        layer.append(conv3(lw, lb))

    rpn_conv_w = pick("rpn.head.conv.0.0.weight", "rpn.head.conv.weight")
    rpn_conv_b = pick("rpn.head.conv.0.0.bias", "rpn.head.conv.bias")
    return {
        "backbone": resnet_convert(backbone_sd),
        "fpn": {"inner": inner, "layer": layer},
        "rpn": {
            "conv": conv3(rpn_conv_w, rpn_conv_b),
            "cls": lin_from_conv1x1("rpn.head.cls_logits.weight",
                                    "rpn.head.cls_logits.bias"),
            "bbox": lin_from_conv1x1("rpn.head.bbox_pred.weight",
                                     "rpn.head.bbox_pred.bias"),
        },
        "box_head": {
            "fc6": lin("roi_heads.box_head.fc6.weight", "roi_heads.box_head.fc6.bias"),
            "fc7": lin("roi_heads.box_head.fc7.weight", "roi_heads.box_head.fc7.bias"),
            "cls_score": lin("roi_heads.box_predictor.cls_score.weight",
                             "roi_heads.box_predictor.cls_score.bias"),
            "bbox_pred": lin("roi_heads.box_predictor.bbox_pred.weight",
                             "roi_heads.box_predictor.bbox_pred.bias"),
        },
    }

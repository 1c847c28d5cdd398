"""Per-stage attribution of Faster R-CNN inference + tv-faithful training on the
real chip (VERDICT r3 item 3: detection is the one workload with no roofline).

Inference (b=8, 512px, the bench_detection shape — reference contract
torchvision fasterrcnn_resnet50_fpn, application.py:13-25):
  full          vmapped fasterrcnn_infer (the serve/detector.py path)
  backbone_fpn  ResNet50 pyramid + FPN only
  rpn_heads     RPN convs + per-level top-k + decode (rpn_propose minus NMS)
  rpn_nms       nms_mask over 2000 candidates alone (the 2000-iteration
                sequential fori_loop suspect)
  roialign      the 4-level pooled loop over 300 proposals alone
  boxhead       fc6/fc7/cls/bbox GEMMs alone
  class_nms     the 7 per-class nms_mask calls over 300 boxes alone

Training (b=8, fwd+bwd of the tv-faithful 4-term loss, train/detection.py):
  tv_full       post_nms_topk=2000 (take-all, the 516 ms regime)
  tv_post512    post_nms_topk=512 (torchvision's box_batch_size_per_image scale)
  tv_post300    post_nms_topk=300
  fast          the sampled fast-loss step (75 ms reference point)

Prints one JSON line. Run on axon from /root/repo (nohup, no timeout)."""
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_util import log, put_ms, setup_jax_cache, timed_windows

setup_jax_cache()

import jax
import jax.numpy as jnp
import numpy as np

from construction_clip_tpu.models import detection as det

B, S, C = 8, 512, 8
results = {"batch": B, "image_size": S}

params = det.init_fasterrcnn(jax.random.key(0), num_classes=C)
rng = np.random.default_rng(0)
imgs = jnp.asarray(rng.random((B, S, S, 3)), jnp.float32)


def sync(o):
    return np.asarray(jax.tree.leaves(o)[0])


def bench(name, fn, *args, windows=5, iters=3):
    try:
        fn(*args)  # compile
        st = timed_windows(lambda: fn(*args), windows=windows, iters=iters,
                           warmup=2, sync=sync)
        put_ms(results, f"{name}_ms", st, ndigits=1)
        log(f"{name}: {st[0]*1e3:.1f} ms")
    except Exception as e:
        log(f"{name}: {type(e).__name__}: {str(e)[:200]}")
        results[f"{name}_error"] = type(e).__name__


# ---------------------------------------------------------------- inference
full = jax.jit(jax.vmap(functools.partial(det.fasterrcnn_infer, image_size=S,
                                          num_classes=C), in_axes=(None, 0)))
bench("infer_full", full, params, imgs)
full_bf16 = jax.jit(jax.vmap(functools.partial(
    det.fasterrcnn_infer, image_size=S, num_classes=C,
    compute_dtype=jnp.bfloat16), in_axes=(None, 0)))
bench("infer_full_bf16", full_bf16, params, imgs)


def backbone_fpn(p, im):
    x = (im - jnp.asarray(det.IMAGE_MEAN)) / jnp.asarray(det.IMAGE_STD)
    return det.fpn_forward(p["fpn"], det.resnet_pyramid(p["backbone"], x[None]))


# NOTE: stage isolates REDUCE their outputs in-jit. Returning the raw FPN
# pyramid ([8,128,128,256] fp32 = 134 MB) times the ~30 MB/s tunnel D2H, not
# the compute — the first run of this tool measured 1304 ms for a stage of a
# 154 ms program that way.
def backbone_fpn_sum(p, im):
    return sum(f.astype(jnp.float32).sum() for f in backbone_fpn(p, im))


bench("infer_backbone_fpn", jax.jit(jax.vmap(backbone_fpn_sum, in_axes=(None, 0))),
      params, imgs)


def backbone_fpn_bf16_sum(p, im):
    cast = lambda t: jax.tree.map(lambda z: z.astype(jnp.bfloat16), t)
    p = {"backbone": cast(p["backbone"]), "fpn": cast(p["fpn"])}
    im = im.astype(jnp.bfloat16)
    x = (im - jnp.asarray(det.IMAGE_MEAN, im.dtype)) \
        / jnp.asarray(det.IMAGE_STD, im.dtype)  # keep normalize in bf16 too
    feats = det.fpn_forward(p["fpn"], det.resnet_pyramid(p["backbone"], x[None]))
    return sum(f.astype(jnp.float32).sum() for f in feats)


bench("infer_backbone_fpn_bf16",
      jax.jit(jax.vmap(backbone_fpn_bf16_sum, in_axes=(None, 0))), params, imgs)

# p_feats at this shape, reused by the isolated stages
p_feats = jax.jit(jax.vmap(backbone_fpn, in_axes=(None, 0)))(params, imgs)
p_feats = [jnp.asarray(np.asarray(f)) for f in p_feats]   # [B,1,h,w,256]


def rpn_heads(p, feats):
    """rpn_propose without nms_mask: heads + per-level topk + decode."""
    outs = []
    for lvl, feat in enumerate(feats):
        stride = 4 * (2 ** lvl)
        h, w = feat.shape[1], feat.shape[2]
        t = jax.nn.relu(det._conv(feat, p["rpn"]["conv"]["w"]) + p["rpn"]["conv"]["b"])
        logits = (t @ p["rpn"]["cls"]["w"] + p["rpn"]["cls"]["b"])[0].reshape(-1)
        deltas = (t @ p["rpn"]["bbox"]["w"] + p["rpn"]["bbox"]["b"])[0].reshape(-1, 4)
        anchors = det.level_anchors(h, w, stride, det.ANCHOR_SIZES[lvl])
        k = min(1000, logits.shape[0])
        top_s, top_i = jax.lax.top_k(logits, k)
        outs.append(det.decode_boxes(deltas[top_i], anchors[top_i],
                                     clip_hw=(S, S)))
    return jnp.concatenate(outs)


bench("infer_rpn_heads", jax.jit(jax.vmap(
    lambda p, *feats: rpn_heads(p, feats), in_axes=(None,) + (0,) * 5)),
    params, *p_feats)

boxes2k = jnp.asarray(rng.random((B, 2000, 4)) * S, jnp.float32)
boxes2k = boxes2k.at[..., 2:].set(boxes2k[..., :2] + 32.0)
scores2k = jnp.asarray(rng.random((B, 2000)), jnp.float32)
bench("infer_rpn_nms", jax.jit(jax.vmap(
    lambda b, s: det.nms_mask(b, s, iou_threshold=0.7, max_out=300,
                              num_candidates=2000))), boxes2k, scores2k)

proposals = jnp.asarray(rng.random((B, 300, 4)) * S, jnp.float32)
proposals = proposals.at[..., 2:].set(proposals[..., :2] + 48.0)


def roialign_stage(feats, props):
    pw = jnp.clip(props[:, 2] - props[:, 0], 1e-6)
    ph = jnp.clip(props[:, 3] - props[:, 1], 1e-6)
    lvl_assign = jnp.clip(jnp.floor(4 + jnp.log2(jnp.sqrt(pw * ph) / 224 + 1e-6)),
                          2, 5).astype(jnp.int32) - 2
    pooled = jnp.zeros((props.shape[0], 7, 7, feats[0].shape[-1]))
    for lvl in range(4):
        stride = 4 * (2 ** lvl)
        fl = det.roi_align(feats[lvl][0], props, spatial_scale=1.0 / stride)
        pooled = jnp.where((lvl_assign == lvl)[:, None, None, None], fl, pooled)
    return pooled


bench("infer_roialign", jax.jit(jax.vmap(
    lambda props, *feats: roialign_stage(feats, props).sum(),  # reduce in-jit
    in_axes=(0,) + (0,) * 5)), proposals, *p_feats)


def roialign_ml(props, feats):
    pw = jnp.clip(props[:, 2] - props[:, 0], 1e-6)
    ph = jnp.clip(props[:, 3] - props[:, 1], 1e-6)
    lvl_assign = jnp.clip(jnp.floor(4 + jnp.log2(jnp.sqrt(pw * ph) / 224 + 1e-6)),
                          2, 5).astype(jnp.int32) - 2
    return det.roi_align_multilevel([f[0] for f in feats[:4]], props,
                                    lvl_assign, strides=(4, 8, 16, 32)).sum()


bench("infer_roialign_multilevel", jax.jit(jax.vmap(
    lambda props, *feats: roialign_ml(props, feats),
    in_axes=(0,) + (0,) * 5)), proposals, *p_feats)

pooled_in = jnp.asarray(rng.random((B, 300, 7, 7, 256)), jnp.float32)


def boxhead(p, pooled):
    flat = pooled.transpose(0, 3, 1, 2).reshape(pooled.shape[0], -1)
    h6 = jax.nn.relu(flat @ p["box_head"]["fc6"]["w"] + p["box_head"]["fc6"]["b"])
    h7 = jax.nn.relu(h6 @ p["box_head"]["fc7"]["w"] + p["box_head"]["fc7"]["b"])
    return (h7 @ p["box_head"]["cls_score"]["w"] + p["box_head"]["cls_score"]["b"],
            h7 @ p["box_head"]["bbox_pred"]["w"] + p["box_head"]["bbox_pred"]["b"])


bench("infer_boxhead", jax.jit(jax.vmap(boxhead, in_axes=(None, 0))),
      params, pooled_in)

probs300 = jnp.asarray(rng.random((B, 300, C)), jnp.float32)


def class_nms(props, probs):
    outs = []
    for c in range(1, C):
        idx_c, keep_c = det.nms_mask(props, jnp.where(probs[:, c] > 0.05,
                                                      probs[:, c], -jnp.inf),
                                     iou_threshold=0.5, max_out=100)
        outs.append(probs[idx_c, c] * keep_c)
    fs = jnp.concatenate(outs)
    return jax.lax.top_k(fs, 100)


bench("infer_class_nms", jax.jit(jax.vmap(class_nms)), proposals, probs300)

# ---------------------------------------------------------------- training
from construction_clip_tpu.train.detection import (DetectionBatch,
                                                   make_detection_train_step,
                                                   tv_detection_losses)
from construction_clip_tpu.train.state import TrainState, make_adamw

gt_boxes = jnp.tile(jnp.asarray([[32.0, 32.0, 200.0, 200.0],
                                 [100.0, 120.0, 400.0, 380.0]]), (B, 1, 1))
gt_labels = jnp.ones((B, 2), jnp.int32)


def tv_step(post, cd=None):
    def loss_fn(p):
        def one(im, gb, gl):
            t = tv_detection_losses(p, im, gb, gl, image_size=S, num_classes=C,
                                    post_nms_topk=post, compute_dtype=cd)
            return sum(t.values())
        return jnp.mean(jax.vmap(one)(imgs, gt_boxes, gt_labels))
    return jax.jit(jax.grad(loss_fn))


for post in (2000, 512, 300):
    bench(f"tv_fwdbwd_post{post}", tv_step(post), params, windows=3, iters=2)
bench("tv_fwdbwd_post512_bf16", tv_step(512, jnp.bfloat16), params,
      windows=3, iters=2)

tx = make_adamw(1e-4, warmup_steps=0, total_steps=100)
step = make_detection_train_step(tx, image_size=S, num_classes=C, mesh=None)
state = TrainState.create(params, tx)
batch = DetectionBatch(images=imgs, gt_boxes=gt_boxes, gt_labels=gt_labels)
key = jax.random.key(1)


# step donates its state arg (donate_argnums=(0,)): thread the new state
# through or the second call reads a deleted buffer (InvalidArgument)
_state = [state]


def fast_step():
    new_state, aux = step(_state[0], batch, key)
    _state[0] = new_state
    return aux["loss"]


bench("fast_step", fast_step, windows=3, iters=2)

print(json.dumps(results))

#!/usr/bin/env python
"""Detector evaluation: run the Faster R-CNN over a box-annotated dataset and
report COCO-style mAP (mAP@[.5:.95], AP50, AP75, per-class).

The reference has no detector evaluation at all (its detector ships pre-trained,
reference application.py:13-25); this closes the loop for train_detection.py.

Dataset JSON: {"annotations": [{"file_name": ..., "boxes": [[x1,y1,x2,y2]...],
"labels": [int...]}]} with boxes in ORIGINAL image pixels, labels 1-based.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from common import enable_compilation_cache


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--json_path", required=True)
    p.add_argument("--image_root", default=".")
    p.add_argument("--checkpoint", default=None,
                   help="torchvision-layout .pth state dict (model_final.pth)")
    p.add_argument("--num_classes", type=int, default=8)
    p.add_argument("--image_size", type=int, default=512)
    p.add_argument("--min_score", type=float, default=0.0)
    p.add_argument("--out", default=None, help="write the metrics JSON here too")
    p.add_argument("--precision", default="fp32", choices=["fp32", "bf16", "auto"],
                   help="detector compute precision: fp32 = torchvision-parity "
                        "numerics; bf16 = the TPU serving configuration "
                        "(JaxDetector default on TPU); auto = bf16 on TPU")
    args = p.parse_args()

    enable_compilation_cache()
    from construction_clip_tpu.infer.detection_eval import evaluate_detections
    from construction_clip_tpu.serve.detector import JaxDetector
    from construction_clip_tpu.data.pipeline import default_load_image

    import jax.numpy as jnp

    cd = {"fp32": jnp.float32, "bf16": jnp.bfloat16, "auto": None}[args.precision]
    det = JaxDetector(args.checkpoint, num_classes=args.num_classes,
                      image_size=args.image_size, compute_dtype=cd)

    with open(args.json_path, encoding="utf-8") as f:
        anns = json.load(f)["annotations"]

    preds, gts = [], []
    skipped = 0
    gt_outside = 0
    for a in anns:
        try:
            img = default_load_image(os.path.join(args.image_root, a["file_name"]))
        except (FileNotFoundError, OSError) as e:
            print(f"skip {a['file_name']}: {e}")
            skipped += 1
            continue
        out = det.detect(img)
        live = [(b, l, s) for b, l, s in
                zip(out["boxes"], out["labels"], out["scores"])
                if s > args.min_score]
        preds.append({"boxes": [b for b, _, _ in live],
                      "labels": [l for _, l, _ in live],
                      "scores": [s for _, _, s in live]})
        # Clip GT to the center square that square-staging shows the detector
        # (boxes mostly outside are excluded and counted) so the metric scores
        # the model, not the staging geometry.
        from construction_clip_tpu.infer.detection_eval import clip_gt_to_center_square
        h, w = img.shape[:2]
        boxes, labels, n_out = clip_gt_to_center_square(
            a.get("boxes", []), a.get("labels", []), h, w)
        gt_outside += n_out
        gts.append({"boxes": boxes, "labels": labels})

    metrics = evaluate_detections(preds, gts, num_classes=args.num_classes)
    metrics["skipped_images"] = skipped
    metrics["evaluated_images"] = len(preds)
    metrics["gt_boxes_outside_crop"] = gt_outside
    print(json.dumps(metrics, indent=2))
    if args.out:
        with open(args.out, "w", encoding="utf-8") as f:
            json.dump(metrics, f, indent=2)


if __name__ == "__main__":
    main()

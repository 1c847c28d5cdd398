"""Object-detection interface for the serving path.

The reference serves torchvision Faster R-CNN (ResNet50-FPN) with a 7-class
construction head loaded from '../pytorch/model_final.pth'
(reference application.py:13-25,51-70). That model is an external artifact; the
framework defines the detector as an interface so serving works with or without one:

  - NullDetector: empty detections (serving runs classify+caption only) — the
    documented substitution while the JAX detector matures (SURVEY.md §7 hard parts).
  - Detector protocol: detect(image_u8) -> {"boxes": [[x1,y1,x2,y2]...],
    "labels": [str...], "scores": [float...]}, matching the reference's JSON shape
    (application.py:51-70 score threshold 0.8, label names from labels.json).
"""

from __future__ import annotations

from typing import Protocol

import numpy as np

from construction_clip_tpu.data.labels import DETECTOR_CLASSES


class Detector(Protocol):
    def detect(self, image_u8: np.ndarray) -> dict: ...


class NullDetector:
    """No detector available: empty detections, same response shape."""

    def detect(self, image_u8: np.ndarray) -> dict:
        return {"boxes": [], "labels": [], "scores": []}


class ThresholdWrapper:
    """Apply the reference's 0.8 score threshold + label-name mapping
    (application.py:60-70) around any raw detector."""

    def __init__(self, inner: Detector, *, threshold: float = 0.8,
                 class_names=DETECTOR_CLASSES):
        self.inner = inner
        self.threshold = threshold
        self.class_names = class_names

    def detect(self, image_u8: np.ndarray) -> dict:
        raw = self.inner.detect(image_u8)
        boxes, labels, scores = [], [], []
        for b, l, s in zip(raw["boxes"], raw["labels"], raw["scores"]):
            if s >= self.threshold:
                boxes.append([float(x) for x in b])
                name = self.class_names[int(l)] if isinstance(l, (int, np.integer)) \
                    and int(l) < len(self.class_names) else str(l)
                labels.append(name)
                scores.append(float(s))
        return {"boxes": boxes, "labels": labels, "scores": scores}

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

    def detect_batch(self, staged_u8, sizes) -> list[dict]:
        return [{"boxes": [], "labels": [], "scores": []} for _ in sizes]


class JaxDetector:
    """The TPU-native Faster R-CNN (models/detection.py) behind the serving
    interface. checkpoint: torchvision-layout .pth state dict (the reference's
    model_final.pth) or None (random weights — smoke/serving-shape testing).

    Staging geometry: the reference's torchvision transform resizes
    (min-side>=800, max-side<=1333) and batch-pads but NEVER crops
    (application.py:55-61 -> GeneralizedRCNNTransform) — every uploaded pixel
    reaches the detector. The default here matches that contract with a
    static-shape equivalent: geometry="letterbox" scales the LONG side to
    image_size (default 800) and zero-pads to a square, so no content is
    discarded; boxes map back through a pure per-axis scale. geometry="crop"
    (short-side scale + center crop, the pre-round-5 behavior) is retained as
    a documented fast config — it discards the long-side bands, see PARITY.md.
    Default num_classes=7 = the reference head (application.py:14)."""

    def __init__(self, checkpoint: str | None = None, *, num_classes: int = 7,
                 image_size: int = 800, geometry: str = "letterbox",
                 class_names=DETECTOR_CLASSES, compute_dtype=None):
        """compute_dtype: detection compute precision; None = bf16 on TPU,
        fp32 elsewhere (box arithmetic is always fp32 — models/detection.py)."""
        import functools

        import jax
        import jax.numpy as jnp

        from construction_clip_tpu.models import detection as det

        if compute_dtype is None:
            compute_dtype = (jnp.bfloat16 if jax.default_backend() != "cpu"
                             else jnp.float32)

        if checkpoint:
            from construction_clip_tpu.models.clip.convert import load_torch_checkpoint

            self.params = det.from_torchvision_state_dict(
                load_torch_checkpoint(checkpoint), num_classes=num_classes)
        else:
            self.params = det.init_fasterrcnn(jax.random.key(0),
                                              num_classes=num_classes)
        if geometry not in ("letterbox", "crop"):
            raise ValueError(f"geometry must be letterbox|crop, got {geometry!r}")
        self.image_size = image_size
        self.geometry = geometry
        self.num_classes = num_classes
        self.class_names = class_names
        self._infer = det.fasterrcnn_infer
        # batched inference: ONE device program over [B,S,S,3] — the serve
        # batcher coalesces concurrent requests through this instead of the
        # per-request detect() call that would serialize the whole route.
        # The program takes UINT8 and casts/scales on device: the host link is
        # the serving bottleneck (tunnel H2D ~30 MB/s here), so shipping fp32
        # would move 4x the bytes (100 MB per 32-drain at S=512). The three
        # result tensors come back as ONE packed [B, N, 6] fp32 fetch
        # (x1,y1,x2,y2,label,score) — one D2H round-trip instead of three.
        vm = jax.vmap(
            functools.partial(det.fasterrcnn_infer, image_size=image_size,
                              num_classes=num_classes,
                              compute_dtype=compute_dtype),
            in_axes=(None, 0))

        def infer_u8_packed(params, imgs_u8):
            out = vm(params, imgs_u8.astype(jnp.float32) / 255.0)
            return jnp.concatenate(
                [out.boxes.astype(jnp.float32),
                 out.labels.astype(jnp.float32)[..., None],
                 out.scores.astype(jnp.float32)[..., None]], axis=-1)

        self._batch_infer = jax.jit(infer_u8_packed)
        self.compute_dtype = compute_dtype

    def stage(self, image_u8: np.ndarray) -> np.ndarray:
        """Host-stage one image to the detector's [S,S,3] uint8 input per the
        configured geometry (the serve batcher calls this before coalescing)."""
        from construction_clip_tpu.data.pipeline import host_letterbox, host_shape_unify

        if self.geometry == "letterbox":
            return host_letterbox(image_u8, self.image_size)
        return host_shape_unify(image_u8, self.image_size)

    def _map_back(self, det_boxes, det_labels, det_scores, size) -> dict:
        """Map detections from the staged square back to original resolution.

        letterbox: content occupies [0,nw)x[0,nh) of the square — a pure
        per-axis downscale by (nw/w, nh/h), then clip to the image (torchvision
        clip_boxes_to_image semantics). crop: short-side scale + center-crop
        offsets (boxes can only land inside the central square — the cropped
        bands are unreachable by construction)."""
        h, w = size
        if self.geometry == "letterbox":
            from construction_clip_tpu.data.pipeline import letterbox_dims

            nh, nw = letterbox_dims(h, w, self.image_size)
            sx, sy = nw / w, nh / h
            off_x = off_y = 0.0
        else:
            sx = sy = self.image_size / min(h, w)
            off_x = (max(w, h) - min(w, h)) / 2 if w > h else 0.0
            off_y = (max(w, h) - min(w, h)) / 2 if h > w else 0.0
        boxes, labels, scores = [], [], []
        for b, l, s in zip(det_boxes, det_labels, det_scores):
            if s <= 0:
                continue
            x1 = min(max(float(b[0]) / sx + off_x, 0.0), w)
            y1 = min(max(float(b[1]) / sy + off_y, 0.0), h)
            x2 = min(max(float(b[2]) / sx + off_x, 0.0), w)
            y2 = min(max(float(b[3]) / sy + off_y, 0.0), h)
            boxes.append([x1, y1, x2, y2])
            labels.append(int(l))
            scores.append(float(s))
        return {"boxes": boxes, "labels": labels, "scores": scores}

    def detect(self, image_u8: np.ndarray) -> dict:
        return self.detect_batch(self.stage(image_u8)[None],
                                 [image_u8.shape[:2]])[0]

    def detect_batch(self, staged_u8, sizes) -> list[dict]:
        """staged_u8: [B, S, S, 3] uint8 (host_shape_unify'd); sizes: per-image
        original (h, w). One jitted vmapped forward (uint8 in, cast on device),
        one packed [B, N, 6] host fetch."""
        import jax.numpy as jnp

        packed = np.asarray(
            self._batch_infer(self.params, jnp.asarray(staged_u8, jnp.uint8)))
        boxes = packed[..., :4]
        labels = packed[..., 4].astype(np.int64)
        scores = packed[..., 5]
        return [self._map_back(boxes[i], labels[i], scores[i], sizes[i])
                for i in range(len(sizes))]


class ThresholdWrapper:
    """Apply the reference's 0.8 score threshold + label-name mapping
    (application.py:60-70) around any raw detector."""

    def __init__(self, inner: Detector, *, threshold: float = 0.8,
                 class_names=DETECTOR_CLASSES):
        self.inner = inner
        self.threshold = threshold
        self.class_names = class_names

    @property
    def image_size(self):
        return getattr(self.inner, "image_size", None)

    @property
    def geometry(self):
        return getattr(self.inner, "geometry", None)

    def stage(self, image_u8: np.ndarray) -> np.ndarray:
        return self.inner.stage(image_u8)

    def _apply(self, raw: dict) -> dict:
        boxes, labels, scores = [], [], []
        for b, l, s in zip(raw["boxes"], raw["labels"], raw["scores"]):
            if s >= self.threshold:
                boxes.append([float(x) for x in b])
                name = self.class_names[int(l)] if isinstance(l, (int, np.integer)) \
                    and int(l) < len(self.class_names) else str(l)
                labels.append(name)
                scores.append(float(s))
        return {"boxes": boxes, "labels": labels, "scores": scores}

    def detect(self, image_u8: np.ndarray) -> dict:
        return self._apply(self.inner.detect(image_u8))

    def detect_batch(self, staged_u8, sizes) -> list[dict]:
        return [self._apply(r) for r in self.inner.detect_batch(staged_u8, sizes)]

"""HTTP serving app — the `application.py` contract, stdlib-only (no Flask in this
image), threaded, with single-init models and a request-batching door left open.

Routes (reference application.py:231-263):
  POST /predict  multipart file upload -> {"boxes", "labels", "scores",
                 "caption_type", "violation_type", "caption"}; non-image extensions
                 rejected with the reference's message.
  GET  /ping     {"response": <name>}
  GET  /         "Hello, World!"

The reference loads models at module import and runs Flask's single-threaded debug
server (application.py:265-282), crossing the device boundary 4x per request. Here a
PredictService owns one jitted classify+embed forward and one jitted decode; requests
are serialized through a lock (TPU programs are not reentrant per process) but all
host work (decode of upload, JSON) is threaded.
"""

from __future__ import annotations

import io
import json
import re
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

IMAGE_EXTENSIONS = {"ras", "xwd", "bmp", "jpe", "jpg", "jpeg", "xpm", "ief", "pbm",
                    "tif", "gif", "ppm", "xbm", "tiff", "rgb", "pgm", "png", "pnm"}


class PredictService:
    """Owns the jitted pipelines. With batch_window_ms > 0, concurrent requests
    are COALESCED into one device batch (the TPU serves N images for ~the cost of
    one at these model sizes) — the serving-throughput lever the reference's
    single-threaded Flask app (application.py:281-282) has no analog for."""

    def __init__(self, caption_pipeline, detector=None, *, use_beam: bool = True,
                 batch_window_ms: float = 0.0, max_batch: int = 16):
        from construction_clip_tpu.serve.detector import NullDetector

        self.pipe = caption_pipeline
        self.detector = detector or NullDetector()
        self.use_beam = use_beam
        self._lock = threading.Lock()
        self._window = batch_window_ms / 1e3
        self._max_batch = max_batch
        # real detectors expose image_size; the batcher then coalesces
        # detection into the SAME drained batch (one vmapped forward) instead
        # of a per-request detect() that would serialize the whole route
        self._det_size = getattr(self.detector, "image_size", None)
        self._pending: list = []  # [(staged_cap, staged_det, (h,w), Event, slot)]
        self._cv = threading.Condition()
        if self._window > 0:
            threading.Thread(target=self._drain_loop, daemon=True,
                             name="predict-batcher").start()

    def _caption_batch(self, staged_list):
        from construction_clip_tpu.data.preprocess import preprocess_batch

        # pad to the next power of two: a drain of n requests reuses one of
        # log2(max_batch)+1 compiled programs instead of compiling every n —
        # what makes a 16-way max_batch practical through the slow-compile tunnel
        n = len(staged_list)
        padded = 1
        while padded < n:
            padded *= 2
        # never exceed the configured device cap: with a non-power-of-two
        # max_batch (e.g. 12), a 9-request drain would otherwise pad to 16 and
        # run an unwarmed compile shape larger than the cap
        padded = min(padded, self._max_batch)
        staged_list = list(staged_list) + [staged_list[-1]] * (padded - n)
        size = self.pipe.clip_cfg.vision.image_size
        imgs = preprocess_batch(np.stack(staged_list), size)
        return self.pipe.caption_images(imgs, use_beam=self.use_beam)[:n]

    def _detect_batch(self, staged_list, sizes):
        # same pow2 padding as _caption_batch so a drain of n requests reuses
        # one of log2(max_batch)+1 compiled detector programs
        n = len(staged_list)
        padded = 1
        while padded < n:
            padded *= 2
        padded = min(padded, self._max_batch)
        staged_list = list(staged_list) + [staged_list[-1]] * (padded - n)
        sizes = list(sizes) + [sizes[-1]] * (padded - n)
        return self.detector.detect_batch(np.stack(staged_list), sizes)[:n]

    def predict(self, image_u8: np.ndarray) -> dict:
        from construction_clip_tpu.data.pipeline import host_shape_unify

        staged = host_shape_unify(image_u8, 256)
        if self._window <= 0:
            detection = self.detector.detect(image_u8)
            with self._lock:
                pred = self._caption_batch([staged])[0]
        else:
            # real detectors own their staging geometry (letterbox by default —
            # the no-content-loss contract, serve/detector.py); fall back to
            # the generic center-crop unify for detectors without stage()
            det_staged = None
            if self._det_size:
                stage_fn = getattr(self.detector, "stage", None)
                det_staged = (stage_fn(image_u8) if stage_fn
                              else host_shape_unify(image_u8, self._det_size))
            if self._det_size is None:  # null detector: free, stays inline
                detection = self.detector.detect(image_u8)
                pred, _ = self._predict_batched(staged, None, image_u8.shape[:2])
            else:
                pred, detection = self._predict_batched(staged, det_staged,
                                                        image_u8.shape[:2])
        return {
            "boxes": detection["boxes"],
            "labels": detection["labels"],
            "scores": detection["scores"],
            "caption_type": pred["caption_type"],
            "violation_type": pred["violation_type"],
            "caption": pred["caption"],
        }

    def _predict_batched(self, staged, det_staged, size):
        done = threading.Event()
        slot: list = [None, None, None]  # [caption result, detection, error]
        with self._cv:
            self._pending.append((staged, det_staged, size, done, slot))
            self._cv.notify()
        # bounded wait: if the batcher thread ever dies, fail fast instead of
        # hanging every subsequent request on an event nobody will set
        if not done.wait(timeout=300.0):
            raise RuntimeError("predict batcher did not respond within 300 s")
        if slot[2] is not None:
            raise slot[2]
        return slot[0], slot[1]

    def _drain_loop(self):
        """Dedicated batcher: wait up to the coalescence window for a FULL
        batch to form, then drain whatever is pending. Draining early is
        allowed ONLY on a full batch — an earlier "adaptive" variant drained
        early whenever anything was pending at re-check, and under closed-loop
        load that races the post-batch resubmission wave (the first 1-2
        resubmitters get drained as a tiny batch and the other ~22 pay a whole
        extra service cycle; measured 40 -> 24 req/s, p50 485 -> 985 ms at
        24-way). The window elapses with the lock RELEASED (cv.wait_for), so
        requests keep queueing and the non-batched path stays free."""
        while True:
            with self._cv:
                while not self._pending:
                    self._cv.wait()
                # let concurrent requests pile up, but stop waiting the moment
                # a FULL batch forms (early drain can only make the batch
                # bigger-or-equal vs sleeping the whole window, never the tiny
                # early batch the adaptive variant produced). wait_for releases
                # the lock while waiting, so requests keep queueing.
                if len(self._pending) < self._max_batch:
                    self._cv.wait_for(
                        lambda: len(self._pending) >= self._max_batch,
                        timeout=self._window)
                batch = self._pending[: self._max_batch]
                self._pending = self._pending[self._max_batch:]
            if not batch:
                continue
            try:
                with self._lock:
                    preds = self._caption_batch([b[0] for b in batch])
                    dets = (self._detect_batch([b[1] for b in batch],
                                               [b[2] for b in batch])
                            if self._det_size is not None else [None] * len(batch))
                for (_, _, _, ev, sl), p, d in zip(batch, preds, dets):
                    sl[0] = p
                    sl[1] = d
                    ev.set()
            except Exception as e:  # propagate to every waiter, keep serving
                for _, _, _, ev, sl in batch:
                    sl[2] = e
                    ev.set()


def _parse_multipart(body: bytes, content_type: str) -> Optional[tuple[str, bytes]]:
    """Extract (filename, data) of the 'file' field from a multipart body."""
    m = re.search(r'boundary="?([^";]+)"?', content_type)
    if not m:
        return None
    boundary = m.group(1).encode()
    for part in body.split(b"--" + boundary):
        if b"Content-Disposition" not in part:
            continue
        header_end = part.find(b"\r\n\r\n")
        if header_end < 0:
            continue
        headers = part[:header_end].decode("utf-8", "replace")
        fm = re.search(r'name="file".*?filename="([^"]*)"', headers, re.S)
        if not fm:
            continue
        data = part[header_end + 4:]
        if data.endswith(b"\r\n"):
            data = data[:-2]
        return fm.group(1), data
    return None


def make_handler(service: PredictService):
    class Handler(BaseHTTPRequestHandler):
        def _json(self, obj, code: int = 200):
            payload = json.dumps(obj, ensure_ascii=False).encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", "application/json; charset=utf-8")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def do_GET(self):
            if self.path == "/ping":
                self._json({"response": "construction_clip_tpu.serve"})
            elif self.path == "/":
                body = b"Hello, World!"
                self.send_response(200)
                self.send_header("Content-Type", "text/plain")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self._json({"error": "not found"}, 404)

        def do_POST(self):
            if self.path != "/predict":
                self._json({"error": "not found"}, 404)
                return
            length = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(length)
            ctype = self.headers.get("Content-Type", "")
            parsed = _parse_multipart(body, ctype) if "multipart" in ctype else None
            if parsed is None:
                self._json({"error": "multipart form with a 'file' field required"}, 400)
                return
            filename, data = parsed
            ext = filename.rsplit(".", 1)[-1].lower() if "." in filename else ""
            if ext not in IMAGE_EXTENSIONS:
                # reference's exact message (application.py:238)
                self._json("Please upload an appropriate image file")
                return
            try:
                from PIL import Image

                img = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"),
                                 dtype=np.uint8)
            except Exception as e:
                self._json({"error": f"cannot decode image: {e}"}, 400)
                return
            self._json(service.predict(img))

        def log_message(self, fmt, *args):  # quiet
            pass

    return Handler


def serve(service: PredictService, *, host: str = "0.0.0.0", port: int = 8000):
    httpd = ThreadingHTTPServer((host, port), make_handler(service))
    print(f"serving on {host}:{port}")
    httpd.serve_forever()

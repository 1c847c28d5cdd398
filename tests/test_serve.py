"""HTTP serving contract (reference application.py:231-263): /predict multipart ->
detection+classification+caption JSON; extension filtering; /ping; /."""

import io
import json
import threading
import urllib.request

import numpy as np
import pytest

import jax

from construction_clip_tpu.core.configs import (
    CLIPConfig, VisionConfig, TextConfig, ClipCapConfig, GPT2Config)
from construction_clip_tpu.models.clip import init_clip
from construction_clip_tpu.models.clipcap import init_clipcap
from construction_clip_tpu.infer.caption import CaptionPipeline
from construction_clip_tpu.serve.app import PredictService, make_handler


class TinyLMTok:
    def encode(self, text):
        return [min(ord(c) % 120 + 3, 122) for c in text][:10]

    def decode(self, ids, skip_special_tokens=True):
        return "".join(chr(0x4E00 + int(i)) for i in ids)


@pytest.fixture(scope="module")
def server():
    ccfg_clip = CLIPConfig(
        vision=VisionConfig(image_size=32, patch_size=8, width=32, layers=2, heads=2,
                            embed_dim=16),
        text=TextConfig(vocab_size=600, context_length=12, width=32, layers=2,
                        heads=2, embed_dim=16),
    )
    gcfg = GPT2Config(vocab_size=128, n_positions=64, n_embd=32, n_layer=2, n_head=2)
    ccfg = ClipCapConfig(prefix_length=3, attribute_length=4, clip_dim=16)
    clip_params = init_clip(jax.random.key(0), ccfg_clip)
    cap_params = init_clipcap(jax.random.key(1), ccfg, gcfg)

    import gzip, tempfile, os

    with tempfile.NamedTemporaryFile(suffix=".txt.gz", delete=False) as f:
        pass
    with gzip.open(f.name, "wt", encoding="utf-8") as g:
        g.write("version\n")
    from construction_clip_tpu.data.clip_tokenizer import ClipTokenizer

    pipe = CaptionPipeline(
        clip_params=clip_params, clip_cfg=ccfg_clip, cap_params=cap_params,
        ccfg=ccfg, gcfg=gcfg, clip_tokenizer=ClipTokenizer(f.name, n_merges=None),
        lm_tokenizer=TinyLMTok(), stop_token=102, max_steps=6, beam_size=2)

    from http.server import ThreadingHTTPServer

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(PredictService(pipe)))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_port}"
    httpd.shutdown()
    os.unlink(f.name)


def _multipart(filename, data):
    boundary = "XxBoUnDaRyxX"
    body = (f"--{boundary}\r\nContent-Disposition: form-data; name=\"file\"; "
            f"filename=\"{filename}\"\r\nContent-Type: application/octet-stream"
            f"\r\n\r\n").encode() + data + f"\r\n--{boundary}--\r\n".encode()
    return body, f"multipart/form-data; boundary={boundary}"


def _post(url, body, ctype):
    req = urllib.request.Request(url, data=body, headers={"Content-Type": ctype},
                                 method="POST")
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, json.loads(r.read().decode())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read().decode())


def test_ping_and_home(server):
    with urllib.request.urlopen(server + "/ping", timeout=10) as r:
        assert json.loads(r.read())["response"]
    with urllib.request.urlopen(server + "/", timeout=10) as r:
        assert r.read() == b"Hello, World!"


def test_predict_contract(server):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray((np.random.default_rng(0).random((64, 64, 3)) * 255)
                    .astype(np.uint8)).save(buf, format="JPEG")
    body, ctype = _multipart("site.jpg", buf.getvalue())
    status, out = _post(server + "/predict", body, ctype)
    assert status == 200
    assert set(out) == {"boxes", "labels", "scores", "caption_type",
                        "violation_type", "caption"}
    assert out["caption_type"] in ("violation", "status")
    assert isinstance(out["caption"], str)
    assert out["boxes"] == []  # NullDetector


def test_predict_rejects_bad_extension(server):
    body, ctype = _multipart("notes.txt", b"hello")
    status, out = _post(server + "/predict", body, ctype)
    assert status == 200  # reference returns the message with 200
    assert out == "Please upload an appropriate image file"


def test_predict_requires_file_field(server):
    status, out = _post(server + "/predict", b"{}", "application/json")
    assert status == 400
    assert "file" in out["error"]


def test_request_batching(rng):
    """batch_window_ms coalesces concurrent requests into one device batch and every
    caller gets its own result."""
    import concurrent.futures as cf

    import jax as _jax

    from construction_clip_tpu.core.configs import (
        CLIPConfig, VisionConfig, TextConfig, ClipCapConfig, GPT2Config)
    from construction_clip_tpu.models.clip import init_clip
    from construction_clip_tpu.models.clipcap import init_clipcap
    from construction_clip_tpu.infer.caption import CaptionPipeline
    from construction_clip_tpu.serve.app import PredictService
    import gzip, tempfile, os

    clip_cfg = CLIPConfig(
        vision=VisionConfig(image_size=32, patch_size=8, width=32, layers=1, heads=2,
                            embed_dim=16),
        text=TextConfig(vocab_size=600, context_length=12, width=32, layers=1,
                        heads=2, embed_dim=16))
    gcfg = GPT2Config(vocab_size=128, n_positions=64, n_embd=32, n_layer=1, n_head=2)
    ccfg = ClipCapConfig(prefix_length=2, attribute_length=3, clip_dim=16)
    with tempfile.NamedTemporaryFile(suffix=".txt.gz", delete=False) as f:
        pass
    with gzip.open(f.name, "wt", encoding="utf-8") as g:
        g.write("version\n")
    from construction_clip_tpu.data.clip_tokenizer import ClipTokenizer

    pipe = CaptionPipeline(
        clip_params=init_clip(_jax.random.key(0), clip_cfg), clip_cfg=clip_cfg,
        cap_params=init_clipcap(_jax.random.key(1), ccfg, gcfg), ccfg=ccfg,
        gcfg=gcfg, clip_tokenizer=ClipTokenizer(f.name, n_merges=None),
        lm_tokenizer=TinyLMTok(), stop_token=102, max_steps=4, beam_size=2)
    svc = PredictService(pipe, use_beam=False, batch_window_ms=100, max_batch=8)

    imgs = [(rng.random((48, 48, 3)) * 255).astype(np.uint8) for _ in range(6)]
    svc.predict(imgs[0])  # warm / compile batch-1 path

    with cf.ThreadPoolExecutor(6) as pool:
        results = list(pool.map(svc.predict, imgs))
    assert len(results) == 6
    for r in results:
        assert r["caption_type"] in ("violation", "status")
    os.unlink(f.name)


def test_drain_loop_full_backlog_skips_window():
    """Batcher semantics pinned (the round-3 throughput regression): a FULL
    backlog drains immediately (no window sleep), an under-full backlog waits
    the whole coalescence window; every waiter gets its own slot result."""
    import concurrent.futures as cf
    import time as _time

    from construction_clip_tpu.serve.app import PredictService

    svc = PredictService(caption_pipeline=None, use_beam=False,
                         batch_window_ms=500, max_batch=4)
    sizes = []

    def fake_batch(staged_list):
        sizes.append(len(staged_list))
        return [{"i": s} for s in staged_list]

    svc._caption_batch = fake_batch

    # full backlog: 4 concurrent requests finish far inside the 500 ms window
    t0 = _time.perf_counter()
    with cf.ThreadPoolExecutor(4) as pool:
        out = list(pool.map(
            lambda i: svc._predict_batched(i, None, (1, 1))[0], range(4)))
    dt_full = _time.perf_counter() - t0
    assert sorted(o["i"] for o in out) == [0, 1, 2, 3]
    assert dt_full < 0.4, f"full backlog waited the window: {dt_full:.3f}s"

    # under-full backlog: a single request pays ~the whole window
    t0 = _time.perf_counter()
    svc._predict_batched(9, None, (1, 1))
    dt_single = _time.perf_counter() - t0
    assert dt_single >= 0.45, f"window not honored: {dt_single:.3f}s"
    assert max(sizes) == 4  # the 4-way drain really was one batch


def test_batched_detector_coalesced_drain():
    """With a real detector (exposes image_size + detect_batch), the drain loop
    runs detection on the SAME coalesced batch — one detect_batch call for N
    concurrent requests, per-request results routed back — instead of the
    per-request detect() that serialized the route (reference contract:
    application.py:231-254 runs detection on every /predict)."""
    import concurrent.futures as cf

    import numpy as np

    from construction_clip_tpu.serve.app import PredictService

    calls = []

    class FakeDetector:
        image_size = 32

        def detect_batch(self, staged_u8, sizes):
            calls.append(staged_u8.shape[0])
            return [{"boxes": [[0, 0, 1, 1]], "labels": ["worker"],
                     "scores": [0.9 + 0.001 * i]} for i in range(len(sizes))]

        def detect(self, image_u8):
            raise AssertionError("batched path must not call detect()")

    svc = PredictService(caption_pipeline=None, detector=FakeDetector(),
                         use_beam=False, batch_window_ms=300, max_batch=4)
    svc._caption_batch = lambda staged_list: [
        {"caption_type": "c", "violation_type": "v", "caption": "x"}
        for _ in staged_list]

    img = np.zeros((48, 64, 3), np.uint8)
    with cf.ThreadPoolExecutor(4) as pool:
        out = list(pool.map(lambda _: svc.predict(img), range(4)))
    assert calls == [4], f"expected one 4-way detect_batch, got {calls}"
    assert all(o["labels"] == ["worker"] for o in out)
    assert len({o["scores"][0] for o in out}) == 4  # per-slot routing, no dup

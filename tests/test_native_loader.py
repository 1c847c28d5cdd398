"""Native C++ JPEG ingest vs the PIL path: correctness (same crop geometry, close
pixels) and a quick speed sanity."""

import io
import os
import time

import numpy as np
import pytest

from construction_clip_tpu.data.native_loader import (
    load_image_native, native_available)
from construction_clip_tpu.data.pipeline import default_load_image, host_shape_unify

needs_native = pytest.mark.skipif(not native_available(),
                                  reason="native lib unavailable (no g++/libjpeg)")


@pytest.fixture()
def jpeg(tmp_path, rng):
    from PIL import Image

    # smooth gradient: JPEG-compression and resampling differences stay small
    yy, xx = np.mgrid[0:480, 0:640]
    img = np.stack([xx % 256, yy % 256, (xx + yy) % 256], axis=-1).astype(np.uint8)
    p = str(tmp_path / "img.jpg")
    Image.fromarray(img).save(p, quality=95)
    return p


@needs_native
def test_native_matches_pil_geometry(jpeg):
    out = load_image_native(jpeg, 224)
    assert out.shape == (224, 224, 3) and out.dtype == np.uint8
    ref = host_shape_unify(default_load_image(jpeg), 224)
    # different resamplers (box vs nearest) on a smooth image: close on average
    diff = np.abs(out.astype(np.int32) - ref.astype(np.int32))
    assert diff.mean() < 8.0, diff.mean()


@needs_native
def test_native_handles_portrait(tmp_path, rng):
    from PIL import Image

    img = (rng.random((640, 300, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "portrait.jpg")
    Image.fromarray(img).save(p)
    out = load_image_native(p, 128)
    assert out.shape == (128, 128, 3)


@needs_native
def test_native_falls_back_on_png(tmp_path, rng):
    from PIL import Image

    img = (rng.random((100, 100, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "img.png")
    Image.fromarray(img).save(p)
    out = load_image_native(p, 64)
    assert out.shape == (64, 64, 3)


@needs_native
def test_native_corrupt_jpeg_falls_back_or_raises(tmp_path):
    p = str(tmp_path / "bad.jpg")
    with open(p, "wb") as f:
        f.write(b"\xff\xd8\xff\xe0garbage")
    with pytest.raises(Exception):
        load_image_native(p, 64)


@needs_native
def test_native_is_faster_than_pil(jpeg):
    load_image_native(jpeg, 224)  # warm (build done)
    t0 = time.perf_counter()
    for _ in range(20):
        load_image_native(jpeg, 224)
    native_t = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(20):
        host_shape_unify(default_load_image(jpeg), 224)
    pil_t = time.perf_counter() - t0
    print(f"native {native_t*50:.1f}ms/img vs pil {pil_t*50:.1f}ms/img")
    # several-x faster with DCT prescale on an idle host; allow 2x slack so a
    # loaded 1-core box (suite + background jobs) doesn't flake the assert —
    # the real regression this guards is the native path going pathological
    assert native_t < pil_t * 2.0

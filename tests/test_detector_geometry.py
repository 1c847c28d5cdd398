"""Detector serving geometry: the reference's transform contract is NO CROP —
torchvision GeneralizedRCNNTransform (reference application.py:55-61) resizes
(min-side>=800) and pads, so every uploaded pixel reaches the detector. The
serving default here (geometry="letterbox") must honor that: an object at the
long-side edge of a non-square upload — which the retained "crop" fast config
provably cannot see — must influence and produce detections there.
"""

import numpy as np
import pytest

from construction_clip_tpu.data.pipeline import (host_letterbox,
                                                 host_shape_unify,
                                                 letterbox_dims)

S = 128  # small staging square: same detector math as 800, CPU-affordable


def _edge_image(h=96, w=192, band=True, seed=2):
    """Non-square image, near-black except (optionally) a bright textured
    object flush against the RIGHT (long-side) edge — inside the band a
    center crop discards."""
    rng = np.random.default_rng(seed)
    img = (rng.random((h, w, 3)) * 12).astype(np.uint8)  # faint noise floor
    if band:
        obj = (rng.random((40, 36, 3)) * 155 + 100).astype(np.uint8)
        img[28:68, w - 36:w] = obj
    return img


def test_letterbox_staging_preserves_edge_content():
    img = _edge_image()
    staged = host_letterbox(img, S)
    nh, nw = letterbox_dims(96, 192, S)
    assert (nh, nw) == (64, 128)  # long side fills the square exactly
    # content region ends exactly at (nh, nw); padding below is zero
    assert staged.shape == (S, S, 3)
    assert staged[nh:].max() == 0
    # the right-edge object survives staging (bright pixels near x=nw)
    assert staged[:nh, nw - 12:nw].max() > 100
    # ...while the center-crop staging provably discards it: the crop keeps
    # x in [48, 144) of the original, so nothing bright remains
    cropped = host_shape_unify(img, S)
    assert cropped.max() < 100


def test_letterbox_identity_when_square_at_size():
    img = (np.random.default_rng(0).random((S, S, 3)) * 255).astype(np.uint8)
    np.testing.assert_array_equal(host_letterbox(img, S), img)


def test_letterbox_upscale_small_image():
    img = (np.random.default_rng(1).random((30, 20, 3)) * 255).astype(np.uint8)
    staged = host_letterbox(img, S)
    nh, nw = letterbox_dims(30, 20, S)
    assert (nh, nw) == (S, 85)
    assert staged[:, nw:].max() == 0
    assert staged[:nh, :nw].mean() > 60  # content upscaled, not padded away


@pytest.fixture(scope="module")
def letterbox_det():
    from construction_clip_tpu.serve.detector import JaxDetector

    return JaxDetector(None, image_size=S, geometry="letterbox")


@pytest.fixture(scope="module")
def crop_det():
    from construction_clip_tpu.serve.detector import JaxDetector

    return JaxDetector(None, image_size=S, geometry="crop")


def test_mapback_letterbox_is_per_axis_scale(letterbox_det):
    # a box in staged coords maps back by dividing the per-axis content scale
    out = letterbox_det._map_back(
        np.array([[10.0, 8.0, 120.0, 60.0]]), np.array([1]), np.array([0.9]),
        (96, 192))
    nh, nw = letterbox_dims(96, 192, S)
    sx, sy = nw / 192, nh / 96
    np.testing.assert_allclose(
        out["boxes"][0], [10 / sx, 8 / sy, 120 / sx, 60 / sy], rtol=1e-6)
    # boxes reaching into the zero pad clip to the image bounds
    out = letterbox_det._map_back(
        np.array([[100.0, 60.0, 128.0, 128.0]]), np.array([1]),
        np.array([0.9]), (96, 192))
    x1, y1, x2, y2 = out["boxes"][0]
    assert x2 <= 192 and y2 <= 96


def test_edge_object_detected_through_letterbox(letterbox_det):
    """The VERDICT-r4 gap test: detections through JaxDetector.detect on a
    non-square image must (a) respond to content at the long-side edge and
    (b) be able to LAND there. Under the old center-crop staging both were
    impossible — the band never reached the device."""
    img = _edge_image(band=True)
    out = letterbox_det.detect(img)
    out_no = letterbox_det.detect(_edge_image(band=False))
    # (a) the edge object changes what the detector reports
    assert out != out_no
    # (b) some detection overlaps the crop-discarded band (x > 144 of 192):
    # reachable only because staging kept the band visible
    band_hits = [b for b in out["boxes"] if b[2] > 144.0]
    assert band_hits, out["boxes"]
    # all boxes map back inside the image
    for b in out["boxes"]:
        assert 0 <= b[0] <= b[2] <= 192 and 0 <= b[1] <= b[3] <= 96


def test_crop_geometry_is_blind_to_edge_bands(crop_det):
    """Documents the retained fast config's divergence: content in the cropped
    bands cannot influence detection, and mapped-back boxes can never land
    outside the central crop window."""
    out = crop_det.detect(_edge_image(band=True))
    out_no = crop_det.detect(_edge_image(band=False))
    assert out == out_no  # band pixels never reach the device
    for o in (out, out_no):
        for b in o["boxes"]:  # crop window is x in [48, 144)
            assert b[0] >= 48 - 1e-6 and b[2] <= 144 + 1e-6


def test_detector_default_matches_reference_contract():
    """Defaults pin the reference serving contract: 7-class head
    (application.py:14), min-side-800-equivalent staging, no-crop geometry."""
    import inspect

    from construction_clip_tpu.serve.detector import JaxDetector

    sig = inspect.signature(JaxDetector.__init__)
    assert sig.parameters["num_classes"].default == 7
    assert sig.parameters["image_size"].default == 800
    assert sig.parameters["geometry"].default == "letterbox"

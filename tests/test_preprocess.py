"""Device preprocessing chain vs the PIL reference chain (the preprocess the reference
gets from clip.load, used at reference CLIP/train.py:56 / predict.py:27)."""

import numpy as np
import pytest

from construction_clip_tpu.data.preprocess import (
    preprocess_image, preprocess_batch, pil_reference_preprocess,
    resize_shorter_side_shape, CLIP_MEAN, CLIP_STD)


def test_resize_shape_semantics():
    assert resize_shorter_side_shape(480, 640, 224) == (224, 299)
    assert resize_shorter_side_shape(640, 480, 224) == (299, 224)
    assert resize_shorter_side_shape(224, 224, 224) == (224, 224)
    assert resize_shorter_side_shape(100, 50, 224) == (448, 224)


@pytest.mark.parametrize("shape", [(480, 640), (640, 480), (300, 300)])
def test_device_matches_pil(shape, rng):
    from PIL import Image

    h, w = shape
    # smooth image: bicubic implementations agree closely away from hard edges
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([
        127 + 100 * np.sin(xx / 37.0) * np.cos(yy / 23.0),
        127 + 100 * np.cos(xx / 17.0),
        127 + 100 * np.sin(yy / 29.0),
    ], axis=-1).clip(0, 255).astype(np.uint8)

    ref = pil_reference_preprocess(Image.fromarray(img))
    ours = np.asarray(preprocess_image(img))
    assert ours.shape == (224, 224, 3)
    # matrix bicubic reproduces PIL's filter exactly; the only residue is PIL's
    # uint8 rounding after resize (±0.5/255 per pixel, /std after normalize)
    assert np.abs(ours - ref).mean() < 0.005
    assert np.abs(ours - ref).max() < 0.02


def test_batch_matches_single(rng):
    imgs = (rng.random((4, 300, 400, 3)) * 255).astype(np.uint8)
    batched = np.asarray(preprocess_batch(imgs))
    singles = np.stack([np.asarray(preprocess_image(i)) for i in imgs])
    np.testing.assert_allclose(batched, singles, atol=1e-5)


def test_normalization_stats(rng):
    imgs = (rng.random((2, 224, 224, 3)) * 255).astype(np.uint8)
    out = np.asarray(preprocess_batch(imgs))
    # invert: out*std+mean must be in [0,1]
    inv = out * np.asarray(CLIP_STD) + np.asarray(CLIP_MEAN)
    assert inv.min() >= -1e-4 and inv.max() <= 1 + 1e-4


def test_preprocess_staged_cpu_path(rng):
    """CPU fallback of the staged fused path equals the separate ops."""
    import jax.numpy as jnp

    from construction_clip_tpu.data.preprocess import preprocess_staged

    imgs = (rng.random((2, 16, 16, 3)) * 255).astype(np.uint8)
    out = np.asarray(preprocess_staged(jnp.asarray(imgs)))
    ref = (imgs.astype(np.float32) / 255.0 - np.asarray(CLIP_MEAN)) / np.asarray(CLIP_STD)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

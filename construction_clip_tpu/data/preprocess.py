"""Image preprocessing: the CLIP chain (bicubic resize shorter-side -> center crop ->
scale to [0,1] -> per-channel normalize), TPU-first.

The reference runs this per-image on the host via PIL inside `clip.load`'s preprocess
Compose (used at reference CLIP/train.py:56, predict.py:27). Here the host only decodes
to uint8 RGB; everything else is a jitted device function over BATCHES, so the resize /
crop / normalize ride the VPU and fuse with the encoder's first matmul, and bytes (not
floats) cross PCIe — 12x less host->device traffic.

CLIP normalization constants (OpenAI):
  mean (0.48145466, 0.4578275, 0.40821073), std (0.26862954, 0.26130258, 0.27577711).
torchvision's ImageNet variant (reference attention_model/train.py:32-38) is also
provided for the show-attend-tell pipeline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def resize_shorter_side_shape(h: int, w: int, size: int) -> tuple[int, int]:
    """Target (H, W) for 'resize shorter side to `size`' — matches torchvision Resize
    semantics (round to nearest)."""
    if h <= w:
        return size, max(size, int(round(w * size / h)))
    return max(size, int(round(h * size / w))), size


@functools.partial(jax.jit, static_argnames=("out_h", "out_w", "antialias"))
def _resize(img, out_h: int, out_w: int, antialias: bool = True):
    return jax.image.resize(img, (out_h, out_w, img.shape[-1]), method="bicubic",
                            antialias=antialias)


@functools.lru_cache(maxsize=64)
def _pil_resize_weights(in_size: int, out_size: int) -> np.ndarray:
    """[out_size, in_size] row-stochastic weights reproducing PIL's bicubic
    resample exactly (support-scaled Keys cubic a=-0.5, per-row normalization —
    the algorithm behind Image.resize(..., BICUBIC))."""
    a = -0.5

    def cubic(x):
        x = abs(x)
        if x < 1.0:
            return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0
        if x < 2.0:
            return (((x - 5.0) * x + 8.0) * x - 4.0) * a
        return 0.0

    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = 2.0 * filterscale
    w = np.zeros((out_size, in_size), np.float64)
    for i in range(out_size):
        center = (i + 0.5) * scale
        lo = max(int(center - support + 0.5), 0)
        hi = min(int(center + support + 0.5), in_size)
        ks = [cubic((j + 0.5 - center) / filterscale) for j in range(lo, hi)]
        s = sum(ks)
        if s != 0:
            w[i, lo:hi] = np.asarray(ks) / s
    return w.astype(np.float32)


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def resize_bicubic_pil(img, out_h: int, out_w: int):
    """PIL-parity bicubic resize as two dense weight matmuls (MXU-friendly:
    the separable filter becomes [out_h, H] and [out_w, W] GEMMs instead of
    jax.image.resize's gather network). img [..., H, W, C] float."""
    wh = jnp.asarray(_pil_resize_weights(img.shape[-3], out_h))
    ww = jnp.asarray(_pil_resize_weights(img.shape[-2], out_w))
    tmp = jnp.einsum("oh,...hwc->...owc", wh, img)
    return jnp.einsum("pw,...owc->...opc", ww, tmp)


def center_crop(img, size: int):
    # torchvision CenterCrop rounds the margin (int(round(m/2)), not m//2):
    # an odd margin like 75 crops at 38, not 37.
    h, w = img.shape[-3], img.shape[-2]
    top = int(round((h - size) / 2.0))
    left = int(round((w - size) / 2.0))
    return img[..., top: top + size, left: left + size, :]


@functools.partial(jax.jit, static_argnames=("mean", "std"))
def normalize(img01, mean=CLIP_MEAN, std=CLIP_STD):
    mean = jnp.asarray(mean, dtype=img01.dtype)
    std = jnp.asarray(std, dtype=img01.dtype)
    return (img01 - mean) / std


def preprocess_image(img_u8: np.ndarray, size: int = 224, *,
                     mean=CLIP_MEAN, std=CLIP_STD) -> jax.Array:
    """Single decoded HWC uint8 RGB image -> [size, size, 3] float32, normalized.

    Resize runs on device (one jit specialization per input resolution — construction
    photo sets have a handful of camera resolutions, so the cache stays small).
    """
    h, w = img_u8.shape[:2]
    th, tw = resize_shorter_side_shape(h, w, size)
    x = jnp.asarray(img_u8, dtype=jnp.float32) / 255.0
    x = resize_bicubic_pil(x, th, tw)
    x = center_crop(x, size)
    return normalize(jnp.clip(x, 0.0, 1.0), tuple(mean), tuple(std))


def preprocess_batch(imgs_u8: np.ndarray, size: int = 224, *,
                     mean=CLIP_MEAN, std=CLIP_STD) -> jax.Array:
    """[B, H, W, 3] uint8 (uniform shape) -> [B, size, size, 3] float32 normalized.

    The batched hot path: one fused device program, bytes cross the host boundary.
    """
    b, h, w, _ = imgs_u8.shape
    th, tw = resize_shorter_side_shape(h, w, size)
    return _preprocess_batch_jit(jnp.asarray(imgs_u8), th, tw, size, tuple(mean), tuple(std))


@functools.partial(jax.jit, static_argnames=("th", "tw", "size", "mean", "std"))
def _preprocess_batch_jit(imgs_u8, th: int, tw: int, size: int, mean, std):
    x = imgs_u8.astype(jnp.float32) / 255.0
    x = resize_bicubic_pil(x, th, tw)
    x = center_crop(x, size)
    return normalize(jnp.clip(x, 0.0, 1.0), mean, std)


def preprocess_staged(images_u8, *, mean=CLIP_MEAN, std=CLIP_STD,
                      out_dtype=None):
    """[B, S, S, 3] uint8 ALREADY at model resolution (e.g. staged by the native
    C++ loader at 224) -> normalized floats, one fused pass.

    On TPU this is the Pallas normalize kernel (ops/pallas_preprocess.py): bytes in,
    bf16 out, no fp32 intermediate — the shortest path from PCIe to the MXU. On
    other backends it is the equivalent jnp expression.
    """
    import jax

    if out_dtype is None:
        out_dtype = jnp.float32
    if jax.default_backend() == "tpu":
        from construction_clip_tpu.ops.pallas_preprocess import normalize_u8

        return normalize_u8(images_u8, mean=tuple(mean), std=tuple(std),
                            out_dtype=out_dtype)
    x = images_u8.astype(jnp.float32) / 255.0
    return normalize(x, tuple(mean), tuple(std)).astype(out_dtype)


def pil_reference_preprocess(pil_img, size: int = 224,
                             mean=CLIP_MEAN, std=CLIP_STD) -> np.ndarray:
    """Host-side PIL chain replicating the reference's preprocess exactly (golden
    path for parity tests). Returns [size, size, 3] float32."""
    from PIL import Image

    w, h = pil_img.size
    if h <= w:
        th, tw = size, max(size, int(round(w * size / h)))
    else:
        th, tw = max(size, int(round(h * size / w))), size
    img = pil_img.convert("RGB").resize((tw, th), Image.BICUBIC)
    arr = np.asarray(img, dtype=np.float32) / 255.0
    top = int(round((th - size) / 2.0))
    left = int(round((tw - size) / 2.0))
    arr = arr[top: top + size, left: left + size, :]
    return ((arr - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)).astype(np.float32)

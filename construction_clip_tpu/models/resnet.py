"""ResNet50 feature-grid encoder (inference-only, frozen), NHWC.

The reference's EncoderCNN wraps torchvision resnet50 minus the head, frozen, emitting
a [B, 49, 2048] spatial grid (reference attention_model/model.py:12-27). Here it is a
functional JAX ResNet-50: 7x7/2 stem + maxpool + bottleneck stages [3,4,6,3]; BatchNorm
runs in inference form (running stats folded into scale/shift at conversion), which is
exactly the reference's frozen usage. Converter consumes torchvision state_dict naming.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

STAGES = (3, 4, 6, 3)
WIDTHS = (64, 128, 256, 512)


def _conv(x, w, stride=1):
    # w: HWIO. Explicit symmetric padding = (k-1)//2 per side, matching torch
    # Conv2d(padding=k//2) — XLA "SAME" pads asymmetrically under stride 2 and
    # silently diverges from torch numerics.
    kh, kw = w.shape[0], w.shape[1]
    pad = ((kh // 2, kh // 2), (kw // 2, kw // 2))
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _bn(x, p):
    # inference BatchNorm as scale/shift (folded at conversion)
    return x * p["scale"] + p["shift"]


def _bottleneck(x, p, stride):
    out = jax.nn.relu(_bn(_conv(x, p["conv1"]), p["bn1"]))
    out = jax.nn.relu(_bn(_conv(out, p["conv2"], stride=stride), p["bn2"]))
    out = _bn(_conv(out, p["conv3"]), p["bn3"])
    if "downsample" in p:
        x = _bn(_conv(x, p["downsample"]["conv"], stride=stride), p["downsample"]["bn"])
    return jax.nn.relu(out + x)


def resnet50_features(params, images):
    """images [B, H, W, 3] (normalized floats) -> [B, (H/32)*(W/32), 2048]."""
    x = jax.nn.relu(_bn(_conv(images, params["stem"]["conv"], stride=2), params["stem"]["bn"]))
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
    x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
                              "VALID")
    for s, blocks in enumerate(params["stages"]):
        for b, bp in enumerate(blocks):
            stride = 2 if (s > 0 and b == 0) else 1
            x = _bottleneck(x, bp, stride)
    b, h, w, c = x.shape
    return x.reshape(b, h * w, c)


def init_resnet50(key, dtype=jnp.float32):
    """Random init (matching shapes) — real use converts torchvision weights."""
    ks = iter(jax.random.split(key, 256))

    def conv(h, w, i, o):
        fan = h * w * i
        return (jax.random.normal(next(ks), (h, w, i, o)) * (2.0 / fan) ** 0.5).astype(dtype)

    def bn(c):
        return {"scale": jnp.ones((c,), dtype), "shift": jnp.zeros((c,), dtype)}

    def block(c_in, width, first_stride):
        p = {
            "conv1": conv(1, 1, c_in, width), "bn1": bn(width),
            "conv2": conv(3, 3, width, width), "bn2": bn(width),
            "conv3": conv(1, 1, width, width * 4), "bn3": bn(width * 4),
        }
        if c_in != width * 4:
            p["downsample"] = {"conv": conv(1, 1, c_in, width * 4), "bn": bn(width * 4)}
        return p

    stages = []
    c_in = 64
    for s, (n, w) in enumerate(zip(STAGES, WIDTHS)):
        blocks = []
        for b in range(n):
            blocks.append(block(c_in, w, 2 if (s > 0 and b == 0) else 1))
            c_in = w * 4
        stages.append(blocks)
    return {"stem": {"conv": conv(7, 7, 3, 64), "bn": bn(64)}, "stages": stages}


def from_torchvision_state_dict(sd, *, eps: float = 1e-5):
    """torchvision resnet50 state_dict -> our params (BN folded to scale/shift)."""
    def a(k):
        x = sd[k]
        if hasattr(x, "detach"):
            x = x.detach().cpu().numpy()
        return np.asarray(x)

    def conv(k):
        return jnp.asarray(a(k).transpose(2, 3, 1, 0))  # OIHW -> HWIO

    def bn(prefix):
        gamma, beta = a(f"{prefix}.weight"), a(f"{prefix}.bias")
        mean, var = a(f"{prefix}.running_mean"), a(f"{prefix}.running_var")
        scale = gamma / np.sqrt(var + eps)
        return {"scale": jnp.asarray(scale), "shift": jnp.asarray(beta - mean * scale)}

    stages = []
    for s in range(4):
        blocks = []
        for b in range(STAGES[s]):
            pre = f"layer{s + 1}.{b}"
            p = {
                "conv1": conv(f"{pre}.conv1.weight"), "bn1": bn(f"{pre}.bn1"),
                "conv2": conv(f"{pre}.conv2.weight"), "bn2": bn(f"{pre}.bn2"),
                "conv3": conv(f"{pre}.conv3.weight"), "bn3": bn(f"{pre}.bn3"),
            }
            if f"{pre}.downsample.0.weight" in sd:
                p["downsample"] = {"conv": conv(f"{pre}.downsample.0.weight"),
                                   "bn": bn(f"{pre}.downsample.1")}
            blocks.append(p)
        stages.append(blocks)
    return {"stem": {"conv": conv("conv1.weight"), "bn": bn("bn1")}, "stages": stages}

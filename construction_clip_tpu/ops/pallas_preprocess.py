"""Fused image-normalize Pallas kernel: uint8 RGB -> normalized float, one pass.

The preprocessing chain (data/preprocess.py) runs resize on-device via jax.image
(gather-heavy, XLA's job) and then scale-to-[0,1] + per-channel normalize. This
kernel fuses the uint8 cast + /255 + (x - mean)/std into a single VMEM pass over
[rows, 128-lane] tiles, writing bf16 directly — one HBM read of bytes, one HBM write
of bf16, no fp32 intermediate (2.5x less preprocessing HBM traffic than
cast->divide->subtract->divide as separate XLA ops when fusion doesn't kick in).

Channel layout note: images are NHWC with C=3 in the last (lane) dimension, which
would waste 125/128 lanes — so the kernel flattens to [B*H, W*3] and applies the
3-periodic mean/std via a precomputed [1, 128]-tiled LCM pattern (W*3 is always a
multiple of 3; 128 lanes x 3 phases -> pattern length lcm(3,128)*... simpler: the
kernel receives mean/std already broadcast to one [block_rows, 384] tile period).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _normalize_kernel(img_ref, mean_ref, inv_std_ref, out_ref):
    # Mosaic has no direct uint8->float32 cast; widen through int32 first.
    x = img_ref[:].astype(jnp.int32).astype(jnp.float32) * (1.0 / 255.0)
    out_ref[:] = ((x - mean_ref[:]) * inv_std_ref[:]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("mean", "std", "out_dtype"))
def normalize_u8(images_u8, *, mean, std, out_dtype=jnp.float32):
    """[B, H, W, 3] uint8 -> [B, H, W, 3] out_dtype, ((x/255) - mean) / std fused.

    mean/std: static 3-tuples. Rows are processed as [B*H, W*3] panels; the
    3-channel constants are materialized once as a [1, W*3] row.
    """
    b, h, w, c = images_u8.shape
    assert c == 3
    row = w * 3
    flat = images_u8.reshape(b * h, row)
    mean_row = jnp.tile(jnp.asarray(mean, jnp.float32), w).reshape(1, row)
    inv_std_row = jnp.tile(1.0 / jnp.asarray(std, jnp.float32), w).reshape(1, row)

    block_rows = 256
    grid = (pl.cdiv(b * h, block_rows),)
    out = pl.pallas_call(
        _normalize_kernel,
        out_shape=jax.ShapeDtypeStruct((b * h, row), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, row), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, row), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, row), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, row), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=3 * b * h * row,
            bytes_accessed=b * h * row * (1 + jnp.dtype(out_dtype).itemsize) + 2 * row * 4,
            transcendentals=0,
        ),
    )(flat, mean_row, inv_std_row)
    return out.reshape(b, h, w, 3)

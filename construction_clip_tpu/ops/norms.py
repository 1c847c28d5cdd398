"""Normalization ops.

fp32 accumulation regardless of compute dtype (bf16 inputs are upcast for the moment
statistics, result cast back) — this is the TPU-correct way to run LayerNorm in a bf16
network and is what keeps parity with the reference's fp32 torch LayerNorm.
"""

from __future__ import annotations

import jax.numpy as jnp
import jax


def layer_norm(x, scale, bias, *, eps: float = 1e-5):
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(dtype)


def rms_norm(x, scale, *, eps: float = 1e-6):
    """T5-style RMSNorm: no mean subtraction, no bias; scale applied after.

    Matches HF T5LayerNorm: variance in fp32, then cast to weight dtype, then scale.
    """
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    y = x32 * jax.lax.rsqrt(var + eps)
    return (y.astype(dtype) * scale).astype(dtype)

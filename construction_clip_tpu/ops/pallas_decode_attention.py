"""Fused decode-step attention over the stacked KV cache.

The t==1 cached-attention step (models/gpt2._attn_over_cache) is the decode
loop's hot read: per layer it consumes the full [B, H, T_max, Dh] k and v
windows. The XLA lowering costs ~3.7x the HBM roofline at B=32 (measured on
v5e, _attr_decode ablations: 63 us/layer vs ~17 us of k+v traffic), for two
reasons: the layer's cache slice is materialized by `dynamic_index_in_dim`
on the [L, B, H, T, Dh] stacked carry (an extra read+write of the window),
and the q*k reduce / p*v reduce are separate passes.

This kernel removes both: the grid runs over the batch; each program DMAs its
(layer, batch-row) k/v block STRAIGHT out of the stacked cache — the layer
index and valid length ride scalar prefetch, so no layer slice ever
materializes — and computes masked fp32 softmax attention for all H heads of
that row in VMEM, one pass over k and one over v.

OUTCOME (round 3, measured on v5e): numerically exact, but SLOWER than the
XLA path it replaced (21.4k vs 23.7k tok/s greedy B=32 — per-program launch
overhead at grid=(32,) with 433 KB blocks eats the saved traffic). The fix
that won instead: UNROLL the t==1 layer loop in models/gpt2.gpt2_forward so
the cache access is a STATIC slice (XLA fuses it — no copy, no kernel).
This module is kept as the working scalar-prefetch reference and for its
interpret-mode tests; it is no longer on the decode path.

Semantics match _attn_over_cache's t==1 path bit-for-bit in structure:
logits = (q * dh^-0.5) . k in fp32, positions > cache_len masked to -inf,
fp32 softmax, out = sum(p * v) in fp32, cast back to q.dtype. Reference
behavior: HF GPT2Attention with layer_past (reference
CLIP_prefix_caption/train.py:92-118 drives it via inputs_embeds).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(jnp.finfo(jnp.float32).min)


def _kernel(scalars_ref, q_ref, k_ref, v_ref, o_ref, *, scale: float):
    # q_ref [G, H, Dh]; k_ref/v_ref [G, H, T, Dh] — G batch rows' windows of
    # the current layer; scalars_ref [2] = (layer, cache_len)
    cache_len = scalars_ref[1]
    q = q_ref[:].astype(jnp.float32) * scale                    # [G, H, Dh]
    k = k_ref[:].astype(jnp.float32)                            # [G, H, T, Dh]
    logits = jnp.sum(q[:, :, None, :] * k, axis=-1)             # [G, H, T]
    t_pos = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 2)
    logits = jnp.where(t_pos <= cache_len, logits, NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)                  # [G, H, T]
    v = v_ref[:].astype(jnp.float32)                            # [G, H, T, Dh]
    out = jnp.sum(p[:, :, :, None] * v, axis=2)                 # [G, H, Dh]
    o_ref[:] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_step_attention(q, ck_all, cv_all, layer, cache_len, *,
                          interpret: bool = False):
    """q [B, H, 1, Dh] over layer `layer` of the stacked cache
    ck_all/cv_all [L, B, H, T, Dh]; positions > cache_len are masked.
    Returns [B, H, 1, Dh] in q.dtype."""
    l_, b, h, t, dh = ck_all.shape
    scale = q.shape[-1] ** -0.5
    qf = q[:, :, 0, :]                                          # [B, H, Dh]
    # leading-dims merge is layout-free; lets blocks stay 4-D (Mosaic rejects
    # some 5-D/reshape combinations) and the index_map pick (layer*B/G + i)
    ckf = ck_all.reshape(l_ * b, h, t, dh)
    cvf = cv_all.reshape(l_ * b, h, t, dh)
    scalars = jnp.stack([layer.astype(jnp.int32),
                         jnp.asarray(cache_len, jnp.int32)])

    # G batch rows per program: fewer kernel launches, bigger DMAs. Working
    # set = double-buffered bf16 k+v blocks (4·g·h·t·dh·itemsize) PLUS the
    # in-kernel fp32 casts of both (2·g·h·t·dh·4); g=8 at the product shape
    # measured 18.2 MB against the 16 MB scoped limit (compiler dump), so
    # budget 9 MB for the formula's terms.
    g = 1
    for cand in (8, 4, 2):
        blk = cand * h * t * dh
        if b % cand == 0 and \
                (4 * blk * ck_all.dtype.itemsize + 2 * blk * 4) <= 9 * 1024 * 1024:
            g = cand
            break

    kv_spec = pl.BlockSpec((g, h, t, dh),
                           lambda i, s: (s[0] * (b // g) + i, 0, 0, 0))
    out = pl.pallas_call(
        functools.partial(_kernel, scale=float(scale)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b // g,),
            in_specs=[pl.BlockSpec((g, h, dh), lambda i, s: (i, 0, 0)),
                      kv_spec, kv_spec],
            out_specs=pl.BlockSpec((g, h, dh), lambda i, s: (i, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, dh), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * t * dh,
            bytes_accessed=2 * b * h * t * dh * ck_all.dtype.itemsize,
            transcendentals=b * h * t,
        ),
        interpret=interpret,
    )(scalars, qf, ckf, cvf)
    return out[:, :, None, :]


_FORCE_OFF = False  # A/B escape hatch for benchmarks/drives


def supported_config(cfg, attn_bias, ancestry) -> bool:
    """t==1 decode step, no padding bias, no beam ancestry (the lazy-beam
    gather crosses batch rows, which a per-row grid cannot express)."""
    return (not _FORCE_OFF and attn_bias is None and ancestry is None
            and cfg.n_embd % cfg.n_head == 0)

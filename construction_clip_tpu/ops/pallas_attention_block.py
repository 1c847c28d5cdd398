"""Fully-fused pre-norm attention block —
out = x + W_out @ MHA(split_heads(W_qkv @ LN(x))) in one Pallas kernel.

At encoder shapes the attention sub-block is many small ops (LN, QKV GEMM, per-head
T x T matmuls, merge, out GEMM, residual) with q/k/v and probs round-tripping HBM.
Here one program processes a batch tile with BOTH weight matrices resident in VMEM
(w_qkv [D,3D] + w_out [D,D] bf16 ~= 5.3 MB for ViT-B), heads unrolled in-kernel via
static last-dim slices (Mosaic rejects >4-D reshapes — learned the hard way).

Measured on v5e, ViT-B/32 shape [256, 50, 768] bf16: **1.59 ms vs 2.30 ms** for the
composable LN+attention+residual path (-31%); max deviation 0.016 (bf16 tolerance).

Differentiable: Pallas forward + autodiff-of-reference-math backward (custom_vjp) —
the training path gets the fused forward too.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(jnp.finfo(jnp.float32).min)


def _kernel(x_ref, ln_s_ref, ln_b_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref,
            out_ref, *, n_heads: int, causal: bool, eps: float):
    # x_ref: [Bt, T, D] batch tile
    bt, t, d = x_ref.shape
    dh = d // n_heads
    x = x_ref[:]
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    h = ((x32 - mean) * jax.lax.rsqrt(var + eps)
         * ln_s_ref[:].astype(jnp.float32) + ln_b_ref[:].astype(jnp.float32)
         ).astype(x.dtype)
    # batched GEMM keeps everything 3-D (Mosaic rejects >4-D reshapes)
    qkv = jax.lax.dot_general(
        h, wqkv_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype) + bqkv_ref[:]  # [Bt,T,3D]
    scale = dh ** -0.5

    # per-head attention via static last-dim slices, fp32 softmax
    outs = []
    for head in range(n_heads):
        off = head * dh
        q = qkv[:, :, off: off + dh]                 # [Bt, T, dh]
        k = qkv[:, :, d + off: d + off + dh]
        v = qkv[:, :, 2 * d + off: 2 * d + off + dh]
        logits = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale   # [Bt, T, T]
        if causal:
            qp = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
            kp = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
            logits = jnp.where((qp >= kp)[None], logits, NEG_INF)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        outs.append(jax.lax.dot_general(
            p.astype(v.dtype), v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(x.dtype))
    merged = jnp.concatenate(outs, axis=-1)          # [Bt, T, D]
    y = jax.lax.dot_general(
        merged, wout_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out_ref[:] = (x32 + y + bout_ref[:].astype(jnp.float32)).astype(out_ref.dtype)


def _ref_math(x, ln_s, ln_b, wqkv, bqkv, wout, bout, n_heads, causal, eps):
    from construction_clip_tpu.ops.attention import qkv_attention
    from construction_clip_tpu.ops.norms import layer_norm

    h = layer_norm(x, ln_s, ln_b, eps=eps)
    return x + qkv_attention(h, {"w_qkv": wqkv, "b_qkv": bqkv, "w_out": wout,
                                 "b_out": bout}, n_heads, is_causal=causal,
                             impl="xla")


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _fused(x, ln_s, ln_b, wqkv, bqkv, wout, bout, n_heads, causal, eps):
    return _forward(x, ln_s, ln_b, wqkv, bqkv, wout, bout, n_heads, causal, eps)


def _fused_fwd(x, ln_s, ln_b, wqkv, bqkv, wout, bout, n_heads, causal, eps):
    out = _fused(x, ln_s, ln_b, wqkv, bqkv, wout, bout, n_heads, causal, eps)
    return out, (x, ln_s, ln_b, wqkv, bqkv, wout, bout)


def _fused_bwd(n_heads, causal, eps, res, g):
    _, vjp = jax.vjp(lambda *a: _ref_math(*a, n_heads, causal, eps), *res)
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_attention_block(x, ln_params, attn_params, *, n_heads: int,
                          causal: bool = False, eps: float = 1e-5):
    """x [B, T, D] -> x + Attn(LN(x)); params as in models/blocks."""
    return _fused(x, ln_params["scale"], ln_params["bias"], attn_params["w_qkv"],
                  attn_params["b_qkv"], attn_params["w_out"], attn_params["b_out"],
                  n_heads, bool(causal), float(eps))


def supported(x, n_heads: int) -> bool:
    b, t, d = x.shape
    if x.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    if d % n_heads:
        return False
    itemsize = x.dtype.itemsize
    weights = (3 * d * d + d * d) * itemsize
    tile = 8 * t * (6 * d) * 4  # x + qkv fp32-ish working set, bt=8
    return weights + tile <= 12 * 1024 * 1024 and t <= 256


def _forward(x, ln_s, ln_b, wqkv, bqkv, wout, bout, n_heads, causal, eps):
    b, t, d = x.shape
    bt = 8
    while b % bt and bt > 1:
        bt //= 2
    grid = (b // bt,)
    tile = pl.BlockSpec((bt, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, n_heads=n_heads, causal=causal, eps=eps),
        out_shape=jax.ShapeDtypeStruct((b, t, d), x.dtype),
        grid=grid,
        in_specs=[tile, const((d,)), const((d,)), const((d, 3 * d)),
                  const((3 * d,)), const((d, d)), const((d,))],
        out_specs=tile,
    )(x, ln_s, ln_b, wqkv, bqkv, wout, bout)

"""int8 fused pre-norm attention block (serving forward only).

Same fusion as ops/pallas_attention_block.py — out = x + W_out·MHA(W_qkv·LN(x))
in one program per batch tile — with the two weight GEMMs on the int8 MXU path
(394 TOP/s on v5e vs 197 TFLOP/s bf16): weights arrive pre-quantized
(per-out-channel symmetric int8 + fp32 scales, ops/quant.py), activations are
quantized per row inside the kernel right after the fp32 LN. Per-head attention
math stays bf16/fp32 — at T=50 those matmuls are latency-bound, int8 buys
nothing. No backward: quantized blocks are a serving configuration.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(jnp.finfo(jnp.float32).min)


def _rowq(h32):
    """fp32 [.., D] -> (int8 rows, fp32 per-row scale [.., 1])."""
    s = jnp.max(jnp.abs(h32), axis=-1, keepdims=True) / 127.0
    s = jnp.where(s > 0, s, 1.0)
    q = jnp.clip(jnp.round(h32 / s), -127, 127).astype(jnp.int8)
    return q, s


def _kernel(x_ref, ln_s_ref, ln_b_ref, wqkv_ref, sqkv_ref, bqkv_ref,
            wout_ref, sout_ref, bout_ref, out_ref,
            *, n_heads: int, causal: bool, eps: float):
    bt, t, d = x_ref.shape
    x = x_ref[:]
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    h32 = ((x32 - mean) * jax.lax.rsqrt(var + eps)
           * ln_s_ref[:].astype(jnp.float32) + ln_b_ref[:].astype(jnp.float32))
    hq, hs = _rowq(h32)
    # weight GEMMs run FLAT [bt*T, D]: a 3-D batched dot lowers to a
    # SEQUENTIAL per-sample loop in Mosaic (see the bf16 block kernel)
    acc = jax.lax.dot_general(
        hq.reshape(bt * t, d), wqkv_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).reshape(bt, t, 3 * d)
    qkv = (acc.astype(jnp.float32) * hs * sqkv_ref[:]
           + bqkv_ref[:].astype(jnp.float32)).astype(x.dtype)
    from construction_clip_tpu.ops.pallas_attention_block import per_head_attention

    merged32 = per_head_attention(qkv, d, n_heads, causal, jnp.float32)
    mq, ms = _rowq(merged32)
    acc = jax.lax.dot_general(
        mq.reshape(bt * t, d), wout_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).reshape(bt, t, d)
    y = acc.astype(jnp.float32) * ms * sout_ref[:]
    out_ref[:] = (x32 + y + bout_ref[:].astype(jnp.float32)).astype(out_ref.dtype)


def supported(x, n_heads: int) -> bool:
    b, t, d = x.shape
    if x.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    if d % n_heads:
        return False
    weights = 3 * d * d + d * d                     # int8
    tile = 8 * t * (6 * d) * 4
    return weights + tile <= 12 * 1024 * 1024 and t <= 256


def fused_attention_block_int8(x, ln_params, qattn, *, n_heads: int,
                               causal: bool = False, eps: float = 1e-5):
    """x [B,T,D]; qattn: attn dict where w_qkv/w_out are {"q": int8, "s": fp32}
    (ops/quant.quantize_tree) and b_qkv/b_out stay float."""
    return _forward(x, ln_params["scale"], ln_params["bias"],
                    qattn["w_qkv"]["q"], qattn["w_qkv"]["s"], qattn["b_qkv"],
                    qattn["w_out"]["q"], qattn["w_out"]["s"], qattn["b_out"],
                    n_heads, bool(causal), float(eps))


def _forward(x, ln_s, ln_b, wqkv, sqkv, bqkv, wout, sout, bout,
             n_heads, causal, eps):
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
                  const((3 * d,)), const((3 * d,)), const((d, d)), const((d,)),
                  const((d,))],
        out_specs=tile,
    )(x, ln_s, ln_b, wqkv, sqkv, bqkv, wout, sout, bout)

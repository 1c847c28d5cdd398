"""Fully-fused pre-norm attention block —
out = x + W_out @ MHA(split_heads(W_qkv @ LN(x))) in one Pallas kernel.

At encoder shapes the attention sub-block is many small ops (LN, QKV GEMM, per-head
T x T matmuls, merge, out GEMM, residual) with q/k/v and probs round-tripping HBM.
Here one program processes a batch tile with BOTH weight matrices resident in VMEM
(w_qkv [D,3D] + w_out [D,D] bf16 ~= 5.3 MB for ViT-B), heads unrolled in-kernel via
static last-dim slices (Mosaic rejects >4-D reshapes — learned the hard way).

Measured on v5e, ViT-B/32 shape [256, 50, 768] bf16: **1.59 ms vs 2.30 ms** for the
composable LN+attention+residual path (-31%); max deviation 0.016 (bf16 tolerance).

Differentiable: Pallas forward + Pallas backward (custom_vjp). The backward is the
train-step sore spot when left to XLA (~23% MFU: per-head T x T matmuls, softmax-bwd
and LN-bwd as separate HBM round-trips), so `_bwd_kernel` recomputes LN/QKV/probs
from the residuals in VMEM and emits, per batch tile, dx plus the staged operands
(h, dqkv, merged) for the weight-grad GEMMs — those two big [B*T,D]x[B*T,3D] GEMMs
stay in XLA where the MXU already runs them well. dLN scale/bias are accumulated
in-kernel across the sequential grid (constant-index fp32 output blocks).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(jnp.finfo(jnp.float32).min)


def _segment_mask(t: int, segments: int, causal: bool):
    """[t, t] bool: True where query i may attend key j. With segments > 1 the
    t positions hold `segments` independent samples packed end-to-end
    (block-diagonal validity); causal applies within each segment (local
    positions i%seg_len >= j%seg_len is equivalent to i >= j on-diagonal)."""
    qp = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    kp = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    ok = None
    if segments > 1:
        seg_len = t // segments
        ok = (qp // seg_len) == (kp // seg_len)
    if causal:
        c = qp >= kp
        ok = c if ok is None else jnp.logical_and(ok, c)
    return ok


def per_head_attention(qkv, d: int, n_heads: int, causal: bool, out_dtype,
                       segments: int = 1):
    """qkv [Bt, T, 3D] -> merged [Bt, T, D] via static last-dim per-head slices,
    fp32 softmax. Shared by the bf16 kernel below and the int8 kernel in
    pallas_attention_block_int8.py.

    segments > 1: each batch row packs that many independent samples along T
    (block-diagonal attention). Packing exists because Mosaic lowers batched
    dot_general as a SEQUENTIAL loop over (batch x head) — at ViT-B shapes that
    is 3,072 tiny [50, 64] matmuls per layer, the measured train-step shape
    floor (BASELINE.md) — and two T=50 samples fit one 128-lane panel, halving
    the op count. Masked cross-sample probs are exactly 0.0, so valid outputs
    are bit-identical to the unpacked computation."""
    bt, t, _ = qkv.shape
    dh = d // n_heads
    scale = dh ** -0.5
    mask = _segment_mask(t, segments, causal)
    outs = []
    for head in range(n_heads):
        off = head * dh
        q = qkv[:, :, off: off + dh]                 # [Bt, T, dh]
        k = qkv[:, :, d + off: d + off + dh]
        v = qkv[:, :, 2 * d + off: 2 * d + off + dh]
        logits = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale   # [Bt, T, T]
        if mask is not None:
            logits = jnp.where(mask[None], logits, NEG_INF)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        # normalize on the [Bt, T, dh] output, not the [T, T] panel — one
        # fewer VPU pass over the panel (identical up to fp32 association).
        # Masked positions hold exp(NEG_INF - m) = 0, so the sum is exact.
        outs.append((jax.lax.dot_general(
            p.astype(v.dtype), v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
            / jnp.sum(p, axis=-1, keepdims=True)).astype(out_dtype))
    return jnp.concatenate(outs, axis=-1)            # [Bt, T, D]


def _kernel(x_ref, ln_s_ref, ln_b_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref,
            out_ref, *, n_heads: int, causal: bool, eps: float,
            segments: int = 1):
    # x_ref: [Bt, T, D] batch tile (T may pack `segments` samples end-to-end)
    bt, t, d = x_ref.shape
    x = x_ref[:]
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    h = ((x32 - mean) * jax.lax.rsqrt(var + eps)
         * ln_s_ref[:].astype(jnp.float32) + ln_b_ref[:].astype(jnp.float32)
         ).astype(x.dtype)
    # weight GEMMs run FLAT [Bt*T, D] (a 3-D batched dot lowers to a
    # SEQUENTIAL per-sample loop in Mosaic with only T sublane rows per pass —
    # flattening is legal because the trailing dim stays lane-aligned)
    qkv = (jax.lax.dot_general(
        h.reshape(bt * t, d), wqkv_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)
        .reshape(bt, t, 3 * d) + bqkv_ref[:])                            # [Bt,T,3D]
    merged = per_head_attention(qkv, d, n_heads, causal, x.dtype,
                                segments=segments)
    y = jax.lax.dot_general(
        merged.reshape(bt * t, d), wout_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(bt, t, d)
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
    x, ln_s, ln_b, wqkv, bqkv, wout, bout = res
    if not supported(x, n_heads):
        _, vjp = jax.vjp(lambda *a: _ref_math(*a, n_heads, causal, eps), *res)
        return vjp(g)
    dx, dqkv, merged, dlns, dlnb = _backward(
        x, g, ln_s, ln_b, wqkv, bqkv, wout, n_heads, causal, eps)
    f32 = jnp.float32
    # weight grads: two large GEMMs over the staged operands — XLA territory.
    # h is recomputed here (elementwise LN, fuses into the GEMM prologue) instead
    # of staged from the kernel: saves a double-buffered [bt,T,D] output block,
    # which is what lets the kernel run at a 2x larger batch tile.
    from construction_clip_tpu.ops.norms import layer_norm
    h = layer_norm(x, ln_s, ln_b, eps=eps).astype(x.dtype)
    dwqkv = jnp.einsum("btd,bte->de", h, dqkv,
                       preferred_element_type=f32).astype(wqkv.dtype)
    dbqkv = jnp.sum(dqkv.astype(f32), axis=(0, 1)).astype(bqkv.dtype)
    dwout = jnp.einsum("btd,bte->de", merged, g,
                       preferred_element_type=f32).astype(wout.dtype)
    dbout = jnp.sum(g.astype(f32), axis=(0, 1)).astype(bout.dtype)
    return (dx, dlns.astype(ln_s.dtype), dlnb.astype(ln_b.dtype),
            dwqkv, dbqkv, dwout, dbout)


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_attention_block(x, ln_params, attn_params, *, n_heads: int,
                          causal: bool = False, eps: float = 1e-5):
    """x [B, T, D] -> x + Attn(LN(x)); params as in models/blocks."""
    return _fused(x, ln_params["scale"], ln_params["bias"], attn_params["w_qkv"],
                  attn_params["b_qkv"], attn_params["w_out"], attn_params["b_out"],
                  n_heads, bool(causal), float(eps))


def _fwd_batch_tile(b: int, t: int, d: int, itemsize: int) -> int:
    """Largest batch tile (<= FWD_BT) whose fwd working set fits the 12 MiB
    budget: resident weights + x/qkv fp32-ish temps per tile. ViT-B towers run
    at bt=8; wider towers (e.g. ViT-L's d=768 text stack) step down rather
    than losing the fused path entirely."""
    weights = (3 * d * d + d * d) * itemsize
    for bt in (FWD_BT, 4, 2, 1):
        if b % bt:
            continue
        if weights + bt * t * (6 * d) * 4 <= 12 * 1024 * 1024:
            return bt
    return 0


def supported(x, n_heads: int) -> bool:
    b, t, d = x.shape
    if x.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    if d % n_heads:
        return False
    return t <= 256 and _fwd_batch_tile(b, t, d, x.dtype.itemsize) > 0


def _bwd_kernel(x_ref, g_ref, ln_s_ref, ln_b_ref, wqkv_ref, bqkv_ref, wout_ref,
                dx_ref, dqkv_ref, merged_ref, dlns_ref, dlnb_ref,
                *, n_heads: int, causal: bool, eps: float, segments: int = 1):
    """Per batch tile: recompute LN/QKV/probs, backprop through attention chain
    and LN; stage h/dqkv/merged for the outside weight-grad GEMMs."""
    bt, t, d = x_ref.shape
    dh_ = d // n_heads
    dtype = x_ref.dtype
    x32 = x_ref[:].astype(jnp.float32)
    g = g_ref[:]
    g32 = g.astype(jnp.float32)

    # --- recompute forward LN (same math as _kernel, for exact probs) ---
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (x32 - mean) * rstd
    ln_s = ln_s_ref[:].astype(jnp.float32)
    h = (xhat * ln_s + ln_b_ref[:].astype(jnp.float32)).astype(dtype)
    # weight GEMMs flat [bt*T, D] — see the forward kernel's note
    qkv = (jax.lax.dot_general(
        h.reshape(bt * t, d), wqkv_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dtype)
        .reshape(bt, t, 3 * d) + bqkv_ref[:])
    scale = dh_ ** -0.5

    # dmerged = g @ wout^T
    dmerged = jax.lax.dot_general(
        g.reshape(bt * t, d), wout_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(bt, t, d)  # [bt, T, D] fp32

    mask = _segment_mask(t, segments, causal)
    outs, dqs, dks, dvs = [], [], [], []
    for head in range(n_heads):
        off = head * dh_
        q = qkv[:, :, off: off + dh_]                            # [bt, Tq, dh]
        k = qkv[:, :, d + off: d + off + dh_]                    # [bt, Tk, dh]
        v = qkv[:, :, 2 * d + off: 2 * d + off + dh_]
        logits = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale          # [bt, Tq, Tk]
        if mask is not None:
            logits = jnp.where(mask[None], logits, NEG_INF)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)               # fp32 probs
        p_lo = p.astype(dtype)
        outs.append(jax.lax.dot_general(
            p_lo, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dtype))
        dmg = dmerged[:, :, off: off + dh_].astype(dtype)        # [bt, Tq, dh]
        dp = jax.lax.dot_general(
            dmg, v, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)                  # [bt, Tq, Tk]
        dvs.append(jax.lax.dot_general(
            p_lo, dmg, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dtype))   # [bt, Tk, dh]
        ds = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * scale
              ).astype(dtype)                                    # [bt, Tq, Tk]
        dqs.append(jax.lax.dot_general(
            ds, k, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dtype))
        dks.append(jax.lax.dot_general(
            ds, q, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dtype))
    merged_ref[:] = jnp.concatenate(outs, axis=-1)
    dqkv = jnp.concatenate(dqs + dks + dvs, axis=-1)             # [bt, T, 3D]
    dqkv_ref[:] = dqkv

    # dh = dqkv @ wqkv^T (flat), then LN backward
    dh = jax.lax.dot_general(
        dqkv.reshape(bt * t, 3 * d), wqkv_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(bt, t, d)   # [bt, T, D] fp32
    dxhat = dh * ln_s
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx_ref[:] = (g32 + rstd * (dxhat - m1 - xhat * m2)).astype(dx_ref.dtype)

    dlns_c = jnp.sum((dh * xhat).reshape(bt * t, d), axis=0)
    dlnb_c = jnp.sum(dh.reshape(bt * t, d), axis=0)
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _():
        dlns_ref[:] = dlns_c
        dlnb_ref[:] = dlnb_c

    @pl.when(jnp.logical_not(first))
    def _():
        dlns_ref[:] = dlns_ref[:] + dlns_c
        dlnb_ref[:] = dlnb_ref[:] + dlnb_c


def _bwd_batch_tile(b: int, t: int, d: int, itemsize: int) -> int:
    """Largest batch tile whose bwd working set fits VMEM. The estimate
    (double-buffered in/out tiles + resident weights + fp32 temps) reproduced the
    compiler's measured 20.05 MB within 2% on the shape that OOM'd, so a 15 MiB
    budget is safe under the 16 MiB scoped limit. Tile size is the main MXU
    occupancy lever here: bt=2 leaves the 128-row systolic array ~3/4 idle on
    the per-head [bt*T, T] matmuls."""
    tp = -(-t // 16) * 16
    weights = (3 * d * d + d * d) * itemsize
    for bt in (8, 4, 2, 1):
        if b % bt:
            continue
        # in: x, g; out: dx, merged (d wide) + dqkv (3d wide); double-buffered
        tiles = 2 * (4 * bt * tp * d + bt * tp * 3 * d) * itemsize
        temps = 4 * bt * tp * d * 4 + 3 * bt * tp * tp * 4
        if weights + tiles + temps <= 15 * 1024 * 1024:
            return bt
    return 0


def _effective_pack(b: int, t: int, d: int, itemsize: int) -> int:
    """Pack factor BOTH passes can afford: _pack_factor's lane-fit candidate,
    accepted only if the packed shape fits the forward tile budget AND the
    backward working-set budget (bt floor of 1 is not a guarantee of fit).
    Shared by _forward/_backward so they can never disagree on packing."""
    pack = _pack_factor(b, t)
    if pack > 1 and _fwd_batch_tile(b // pack, pack * t, d, itemsize) \
            and _bwd_batch_tile(b // pack, pack * t, d, itemsize):
        return pack
    return 1


def _backward(x, g, ln_s, ln_b, wqkv, bqkv, wout, n_heads, causal, eps):
    b0, t0, d = x.shape
    pack = _effective_pack(b0, t0, d, x.dtype.itemsize)
    if pack > 1:
        b, t = b0 // pack, pack * t0
        x, g = x.reshape(b, t, d), g.reshape(b, t, d)
    else:
        b, t = b0, t0
    bt = _bwd_batch_tile(b, t, d, x.dtype.itemsize) or 1
    grid = (b // bt,)
    tile = lambda width: pl.BlockSpec((bt, t, width), lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                       memory_space=pltpu.VMEM)
    acc = pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM)
    dx, dqkv, merged, dlns, dlnb = pl.pallas_call(
        functools.partial(_bwd_kernel, n_heads=n_heads, causal=causal, eps=eps,
                          segments=pack),
        out_shape=(
            jax.ShapeDtypeStruct((b, t, d), x.dtype),       # dx
            jax.ShapeDtypeStruct((b, t, 3 * d), x.dtype),   # dqkv (staged)
            jax.ShapeDtypeStruct((b, t, d), x.dtype),       # merged (staged)
            jax.ShapeDtypeStruct((d,), jnp.float32),        # dln_scale (accum)
            jax.ShapeDtypeStruct((d,), jnp.float32),        # dln_bias (accum)
        ),
        grid=grid,
        in_specs=[tile(d), tile(d), const((d,)), const((d,)), const((d, 3 * d)),
                  const((3 * d,)), const((d, d))],
        out_specs=(tile(d), tile(3 * d), tile(d), acc, acc),
    )(x, g, ln_s, ln_b, wqkv, bqkv, wout)
    if pack > 1:
        dx = dx.reshape(b0, t0, d)
        dqkv = dqkv.reshape(b0, t0, 3 * d)
        merged = merged.reshape(b0, t0, d)
    return dx, dqkv, merged, dlns, dlnb


FWD_BT = 8  # forward batch tile (A/B-swept on chip; see module docstring)


PACK_SAMPLES = False  # measured on v5e at [128, 50, 768] bf16: packed fwd
#                       1.399 ms vs unpacked 1.310, fwd+bwd 2.136 vs 2.062 —
#                       halving the per-head matmul count does NOT pay: the
#                       packed [100,100] panel pads to [104,128] (same MXU
#                       tiles as two [56,128] panels) while the packed bwd
#                       batch tile drops 4 -> 1 (VMEM), losing pipelining.
#                       The segments machinery stays (tested) for shapes
#                       where a future pack is a genuine win.


def _pack_factor(b: int, t: int) -> int:
    """How many samples to pack end-to-end along T (block-diagonal attention).
    Only all-batch-uniform packings that keep the packed panel within one
    128-lane tile can make the per-head matmul cheaper; everything else is 1.
    LN/QKV/out-proj are per-token so only the attention mask is aware of it."""
    if not PACK_SAMPLES:
        return 1
    for s in (4, 3, 2):
        if s * t <= 128 and b % s == 0:
            return s
    return 1


def _forward(x, ln_s, ln_b, wqkv, bqkv, wout, bout, n_heads, causal, eps):
    b, t, d = x.shape
    pack = _effective_pack(b, t, d, x.dtype.itemsize)
    if pack > 1:
        # free reshape: sample s of packed row i is row i*pack+s — row-major
        # layout is unchanged, only the attention mask sees segment boundaries
        b, t = b // pack, pack * t
        x = x.reshape(b, t, d)
    bt = _fwd_batch_tile(b, t, d, x.dtype.itemsize) or 1
    grid = (b // bt,)
    tile = pl.BlockSpec((bt, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, n_heads=n_heads, causal=causal, eps=eps,
                          segments=pack),
        out_shape=jax.ShapeDtypeStruct((b, t, d), x.dtype),
        grid=grid,
        in_specs=[tile, const((d,)), const((d,)), const((d, 3 * d)),
                  const((3 * d,)), const((d, d)), const((d,))],
        out_specs=tile,
    )(x, ln_s, ln_b, wqkv, bqkv, wout, bout)
    return out.reshape(b * pack, t // pack, d) if pack > 1 else out

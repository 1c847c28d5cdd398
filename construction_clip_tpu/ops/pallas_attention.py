"""Fused attention Pallas kernel for the encoder hot path.

Shape regime (SURVEY.md §5): sequences are SHORT — 50 image patches (ViT-B/32),
77 text tokens, ≤141 decode positions — and batch is large. A streaming flash
decomposition buys nothing here; the win is FUSION: one kernel per (batch, head)
computes qk^T -> masked fp32 softmax -> @v entirely in VMEM, so the [T, T]
probability matrix never round-trips HBM, and the MXU sees back-to-back matmuls.

Layout: q/k/v [B, H, T, D] are flattened to [B*H, T, D]; grid = (B*H // HEADS_PER_TILE,);
each program processes HEADS_PER_TILE heads' [T, D] panels (grouped so the sublane
dimension is well-filled for small T).

Falls back (supported() -> False) for: attention bias (padding masks ride the XLA
path), cross-length causal offsets, very long T (VMEM), or exotic dtypes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(jnp.finfo(jnp.float32).min)

_MAX_T = 1024  # [T, T] fp32 panel must fit VMEM comfortably


def supported(q, k, v, *, bias=None) -> bool:
    if bias is not None:
        return False
    if q.ndim != 4 or k.shape != v.shape:
        return False
    if q.shape[2] != k.shape[2]:
        return False  # cross-length (cached decode) rides the XLA path
    if q.shape[2] > _MAX_T:
        return False
    if q.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    return True


def _split_point(t: int, causal: bool) -> int:
    """Lane-aligned key split for awkward sequence lengths (0 = no split).

    ViT towers append CLS to a power-of-two patch grid, so T = s + r with s a
    multiple of 128 and r tiny (ViT-L/14: 257 = 256 + 1). A monolithic [T, T]
    logits panel lane-pads T -> ceil(T/128)*128 (257 -> 384: +49% MXU work on
    EVERY qk/pv/grad matmul — the measured 9.4 TF/s attention-core floor,
    BASELINE.md). Splitting keys at s keeps the big matmuls lane-aligned on
    the MXU and handles the r remainder keys as broadcast-multiply-reduce VPU
    terms, whose cost is O(r·T·D) elementwise — negligible for r ≤ 4."""
    if causal or t <= 128 or t % 128 == 0:
        return 0
    s = (t // 128) * 128
    return s if t - s <= 4 else 0


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, causal: bool,
                 split: int = 0):
    # refs: [G, T, D] — G heads per program
    g, t, d = q_ref.shape
    q = q_ref[:].astype(jnp.float32)
    k = k_ref[:].astype(jnp.float32)
    if split:
        # main keys on the MXU at lane-aligned width `split`; each of the
        # (t - split) remainder keys is a VPU multiply-reduce (rank-1 terms)
        logits = jax.lax.dot_general(
            q, k[:, :split, :], dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale      # [G, T, split]
        rem = [jnp.sum(q * k[:, j:j + 1, :], axis=-1) * scale
               for j in range(split, t)]                     # r x [G, T]
        m = jnp.max(logits, axis=-1)
        for rl in rem:
            m = jnp.maximum(m, rl)
        p = jnp.exp(logits - m[..., None])
        pr = [jnp.exp(rl - m) for rl in rem]
        denom = jnp.sum(p, axis=-1)
        for pj in pr:
            denom = denom + pj
        # normalization folds into the [G, T, D] output (one divide per output
        # element) instead of a full extra VPU pass over the [G, T, split] panel
        out = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[:, :split, :],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)              # [G, T, D]
        v = v_ref[:].astype(jnp.float32)
        for j, pj in zip(range(split, t), pr):
            out = out + pj[..., None] * v[:, j:j + 1, :]
        o_ref[:] = (out / denom[..., None]).astype(o_ref.dtype)
        return
    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale          # [G, T, T]
    if causal:
        q_pos = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
        k_pos = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
        logits = jnp.where((q_pos >= k_pos)[None], logits, NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    out = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[:],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                  # [G, T, D]
    # normalize on the [G, T, D] output, not the [G, T, T] panel (saves a full
    # VPU pass over the panel; identical math up to fp32 association)
    o_ref[:] = (out / jnp.sum(p, axis=-1, keepdims=True)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("is_causal", "scale"))
def flash_attention(q, k, v, *, bias=None, is_causal: bool = False,
                    scale: float | None = None):
    """Fused attention; same contract as ops.attention.mha (bias must be None).
    Differentiable: Pallas forward + analytic jnp backward (custom_vjp below)."""
    assert bias is None
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _fa(q, k, v, bool(is_causal), float(scale))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fa(q, k, v, is_causal: bool, scale: float):
    return _forward(q, k, v, is_causal, scale)


def _fa_fwd(q, k, v, is_causal, scale):
    return _fa(q, k, v, is_causal, scale), (q, k, v)


def _fa_bwd(is_causal, scale, res, g):
    """Analytic backward.

    Preferred path: a Pallas kernel per (batch*head) group that recomputes the
    fp32 probs IN VMEM from q,k — the [B,H,T,T] probs/dp/ds slabs never touch
    HBM at all. At ViT-L/14 b=64 (T=257) the jnp backward moves ~810 MB of
    fp32 panels per layer (write+read of p, dp, ds); on-chip that is ~2 ms of
    pure HBM traffic per layer, ~48 ms of the whole-step time over 24 layers.

    Fallback (CPU, exotic shapes): the jnp math, batch-chunked with lax.map so
    the probs working set stays ~hundreds of MB — at large T the three live
    fp32 temps are otherwise ~3.2 GB landing on top of the remat-recompute
    working set (the round-3 OOM)."""
    q, k, v = res
    b, h, t, _ = q.shape
    if _bwd_pallas_supported(q):
        return _bwd_pallas(q, k, v, g, is_causal, scale)
    per_sample = h * t * t * 4  # one fp32 [H,T,T] probs slab per batch row
    chunk = max(1, (64 * 1024 * 1024) // per_sample)
    if t > 256 and chunk < b:
        while b % chunk:
            chunk -= 1
        qs, ks, vs, gs = (x.reshape(b // chunk, chunk, *x.shape[1:])
                          for x in (q, k, v, g))
        dq, dk, dv = jax.lax.map(
            lambda a: _bwd_math(*a, is_causal, scale), (qs, ks, vs, gs))
        return (dq.reshape(q.shape), dk.reshape(k.shape), dv.reshape(v.shape))
    return _bwd_math(q, k, v, g, is_causal, scale)


def _bwd_math(q, k, v, g, is_causal, scale):
    """dV = P^T g;  dS = P * (gV^T - rowsum(gV^T * P));  dQ = scale*dS K;
    dK = scale*dS^T Q — everything accumulated in fp32."""
    logits = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32),
                        preferred_element_type=jnp.float32) * scale
    if is_causal:
        t = q.shape[2]
        q_pos = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
        k_pos = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
        logits = jnp.where((q_pos >= k_pos)[None, None], logits, NEG_INF)
    p = jax.nn.softmax(logits, axis=-1)
    g32 = g.astype(jnp.float32)
    v32 = v.astype(jnp.float32)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, g32, preferred_element_type=jnp.float32)
    dp = jnp.einsum("bhqd,bhkd->bhqk", g32, v32, preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = scale * jnp.einsum("bhqk,bhkd->bhqd", ds, k.astype(jnp.float32),
                            preferred_element_type=jnp.float32)
    dk = scale * jnp.einsum("bhqk,bhqd->bhkd", ds, q.astype(jnp.float32),
                            preferred_element_type=jnp.float32)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_fa.defvjp(_fa_fwd, _fa_bwd)


def _bwd_pallas_supported(q, *, interpret: bool = False) -> bool:
    """Kernel path gate: TPU backend (or interpret-mode testing), supported
    dtype, and a per-program working set that fits VMEM at G=1 (three fp32
    [T, T] panels + four [T, D] operands, lane-padded)."""
    if not interpret and jax.default_backend() != "tpu":
        return False
    if q.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    b, h, t, d = q.shape
    tp = -(-t // 8) * 8          # sublane-padded rows
    tl = -(-t // 128) * 128      # lane-padded cols
    dl = -(-d // 128) * 128
    panels = 3 * tp * tl * 4                       # logits/p/dp (ds reuses)
    operands = 7 * tp * dl * 4                     # q,k,v,g + dq,dk,dv fp32-ish
    return panels + operands <= 10 * 1024 * 1024


def _bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref,
                *, scale: float, causal: bool, split: int = 0):
    """Recompute fp32 probs from q,k in VMEM, then the analytic grads — the
    [T, T] panels live only in VMEM (same math as _bwd_math, verified
    element-exact in interpret mode)."""
    gsz, t, d = q_ref.shape
    q = q_ref[:].astype(jnp.float32)
    k = k_ref[:].astype(jnp.float32)
    v = v_ref[:].astype(jnp.float32)
    dout = g_ref[:].astype(jnp.float32)
    if split:
        # lane-aligned key split (see _split_point): all four grad matmuls run
        # at width `split`; remainder keys contribute VPU rank-1 terms
        km, vm = k[:, :split, :], v[:, :split, :]
        rng = range(split, t)
        logits = jax.lax.dot_general(
            q, km, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale       # [G, Tq, s]
        rem = [jnp.sum(q * k[:, j:j + 1, :], axis=-1) * scale for j in rng]
        m = jnp.max(logits, axis=-1)
        for rl in rem:
            m = jnp.maximum(m, rl)
        p = jnp.exp(logits - m[..., None])
        pr = [jnp.exp(rl - m) for rl in rem]
        denom = jnp.sum(p, axis=-1)
        for pj in pr:
            denom = denom + pj
        p = p / denom[..., None]
        pr = [pj / denom for pj in pr]
        dv_ref[:, :split, :] = jax.lax.dot_general(
            p, dout, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype)
        for j, pj in zip(rng, pr):
            dv_ref[:, j:j + 1, :] = jnp.sum(
                pj[..., None] * dout, axis=1, keepdims=True).astype(dv_ref.dtype)
        dp = jax.lax.dot_general(
            dout, vm, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)               # [G, Tq, s]
        dpr = [jnp.sum(dout * v[:, j:j + 1, :], axis=-1) for j in rng]
        rowsum = jnp.sum(dp * p, axis=-1)
        for dpj, pj in zip(dpr, pr):
            rowsum = rowsum + dpj * pj
        ds = p * (dp - rowsum[..., None]) * scale
        dsr = [pj * (dpj - rowsum) * scale for pj, dpj in zip(pr, dpr)]
        dq = jax.lax.dot_general(
            ds, km, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        for j, dsj in zip(rng, dsr):
            dq = dq + dsj[..., None] * k[:, j:j + 1, :]
        dq_ref[:] = dq.astype(dq_ref.dtype)
        dk_ref[:, :split, :] = jax.lax.dot_general(
            ds, q, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dk_ref.dtype)
        for j, dsj in zip(rng, dsr):
            dk_ref[:, j:j + 1, :] = jnp.sum(
                dsj[..., None] * q, axis=1, keepdims=True).astype(dk_ref.dtype)
        return
    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale           # [G, Tq, Tk]
    if causal:
        q_pos = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
        k_pos = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
        logits = jnp.where((q_pos >= k_pos)[None], logits, NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    dv_ref[:] = jax.lax.dot_general(
        p, dout, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(dv_ref.dtype)  # [G, Tk, D]
    dp = jax.lax.dot_general(
        dout, v, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                       # [G, Tq, Tk]
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * scale
    dq_ref[:] = jax.lax.dot_general(
        ds, k, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(dq_ref.dtype)
    dk_ref[:] = jax.lax.dot_general(
        ds, q, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(dk_ref.dtype)


def _bwd_pallas(q, k, v, g, is_causal, scale, *, interpret: bool = False):
    b, h, t, d = q.shape
    bh = b * h
    tp = -(-t // 8) * 8
    tl = -(-t // 128) * 128
    dl = -(-d // 128) * 128
    gsz = 1
    for cand in (16, 8, 4, 2):
        if bh % cand == 0 and \
           cand * (3 * tp * tl + 7 * tp * dl) * 4 <= 10 * 1024 * 1024:
            gsz = cand
            break
    shape = (bh, t, d)
    qf, kf, vf, gf = (x.reshape(shape) for x in (q, k, v, g))
    spec = pl.BlockSpec((gsz, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=float(scale), causal=is_causal,
                          split=_split_point(t, is_causal)),
        out_shape=tuple(jax.ShapeDtypeStruct(shape, x.dtype) for x in (q, k, v)),
        grid=(bh // gsz,),
        in_specs=[spec] * 4,
        out_specs=(spec,) * 3,
        cost_estimate=pl.CostEstimate(
            flops=10 * bh * t * t * d,
            bytes_accessed=7 * bh * t * d * q.dtype.itemsize,
            transcendentals=bh * t * t,
        ),
        interpret=interpret,
    )(qf, kf, vf, gf)
    full = (b, h, t, d)
    return dq.reshape(full), dk.reshape(full), dv.reshape(full)


def _forward(q, k, v, is_causal: bool, scale: float):
    b, h, t, d = q.shape
    bh = b * h
    # group heads so each program's sublane dim (G*T rows across panels) is busy;
    # measured on v5e at ViT-B/32 shape (T=50): g=64 1.40ms, g=16 1.48, g=8 1.53,
    # g=4 1.74 — prefer the largest group whose fp32 logits panel fits VMEM.
    # Budget with the PADDED panel the compiler actually allocates (sublane rows,
    # lane cols; the key split caps cols at the split point + one remainder
    # lane-tile), as _bwd_pallas_supported does — unpadded t*t undercounts by
    # ~50% at awkward T like 257.
    split = _split_point(t, is_causal)
    tp = -(-t // 8) * 8
    tl = split + 128 if split else -(-t // 128) * 128
    g = 1
    for cand in (64, 32, 16, 8, 4, 2):
        if bh % cand == 0 and cand * tp * tl * 4 <= 4 * 1024 * 1024:
            g = cand
            break

    qf = q.reshape(bh, t, d)
    kf = k.reshape(bh, t, d)
    vf = v.reshape(bh, t, d)

    grid = (bh // g,)
    spec = pl.BlockSpec((g, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=float(scale), causal=is_causal,
                          split=_split_point(t, is_causal)),
        out_shape=jax.ShapeDtypeStruct((bh, t, d), q.dtype),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * t * t * d,
            bytes_accessed=3 * bh * t * d * q.dtype.itemsize + bh * t * d * q.dtype.itemsize,
            transcendentals=bh * t * t,
        ),
    )(qf, kf, vf)
    return out.reshape(b, h, t, d)

"""A/B the mT5 LM-head GEMV at the cached-decode step shape (BASELINE.md
"mT5 B=1 decode floor": the untied 250112x512 bf16 head read costs 0.625 ms
at B=1 = ~2x its 0.31 ms HBM roofline; the head is 62% of the B=1 step).

Isolated-op variants, each applied REP times IN-JIT with a data dependency
(loop-carried argmax fed back into x) so nothing is CSE'd or overlapped away:

  bf16        x[B,512]bf16 @ W[512,V]bf16 -> f32 argmax  (the shipping op)
  bf16_T      W stored [V,512]; logits via dot_general contracting on the
              trailing dim of both (row-major streaming of the big operand)
  int8        weight-only int8 + per-column f32 scale, dequant fused in the
              dot epilogue: (x @ Wq.bf16) * scale — halves the table read
  int8_argmax int8 as above but argmax taken on the UNscaled product with
              nonneg per-column scales folded... (not semantics-preserving
              for per-column scales; kept out — see note below)
  pallas      streaming Pallas GEMV: grid over 2048-lane V tiles, K=512
              resident, dot per tile (measures whether XLA's 2x-roofline
              GEMV is schedule overhead Mosaic's pipeline avoids)
  pallas_int8 same kernel, int8 table + f32 scale epilogue

The winner (if any beats bf16 meaningfully) graduates into
models/t5.quantize_t5_head + the decode path. Reference workload:
/root/reference/CLIP_prefix_caption/test_t5.py:245-249 (B=1 generate).

Run on axon from /root/repo via nohup; prints one JSON line.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_util import log, setup_jax_cache, timed_windows

setup_jax_cache()

import functools

import jax
import jax.numpy as jnp
import numpy as np

D = 512
V = int(os.environ.get("AB_V", 250112))  # mT5 vocab (models/t5.py:127)
VT = 2048           # pallas V tile (lanes)
VPAD = ((V + VT - 1) // VT) * VT
REP = int(os.environ.get("AB_REP", 32))

rng = np.random.default_rng(0)
W_np = (rng.standard_normal((D, V)) * 0.02).astype(np.float32)
scale_np = (np.abs(W_np).max(axis=0) / 127.0).astype(np.float32)
Wq_np = np.clip(np.round(W_np / scale_np), -127, 127).astype(np.int8)

W = jnp.asarray(W_np, jnp.bfloat16)
W_T = jnp.asarray(W_np.T, jnp.bfloat16)
Wq = jnp.asarray(Wq_np)
scale = jnp.asarray(scale_np)
W_pad = jnp.pad(W, ((0, 0), (0, VPAD - V)))
Wq_pad = jnp.pad(Wq, ((0, 0), (0, VPAD - V)))
scale_pad = jnp.pad(scale, (0, VPAD - V))


INTERPRET = os.environ.get("AB_INTERPRET", "") == "1"  # CPU parity checks


def _pallas_gemv(x8, table, scale_or_none, vt: int = VT):
    """x8: [8, D] (B padded to one sublane tile); table: [D, Vp] bf16|int8,
    Vp % vt == 0. Returns [8, Vp] f32 logits. One V tile per program; K
    resident."""
    from jax.experimental import pallas as pl

    int8 = table.dtype == jnp.int8

    def kernel(x_ref, w_ref, *rest):
        w = w_ref[...]
        acc = jax.lax.dot_general(
            x_ref[...], w.astype(jnp.bfloat16) if int8 else w,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        if int8:
            s_ref, o_ref = rest
            o_ref[...] = acc * s_ref[...].astype(jnp.float32)
        else:
            (o_ref,) = rest
            o_ref[...] = acc

    rows = x8.shape[0]
    vp = table.shape[1]
    in_specs = [pl.BlockSpec((rows, D), lambda j: (0, 0)),
                pl.BlockSpec((D, vt), lambda j: (0, j))]
    args = [x8, table]
    if int8:
        in_specs.append(pl.BlockSpec((1, vt), lambda j: (0, j)))
        args.append(scale_or_none[None, :])
    return pl.pallas_call(
        kernel, grid=(vp // vt,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rows, vt), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((rows, vp), jnp.float32),
        interpret=INTERPRET,
    )(*args)


# tables are passed as JIT ARGUMENTS, never closed over: axon remote-compiles
# via HTTP and closure constants inline the 256 MB table into the program
# (rejected/minutes-slow upload — verify skill "never close over large arrays")
TABLES = {
    "bf16": (W,),
    "bf16_T": (W_T,),
    "int8": (Wq, scale),
    "int8_mxu": (Wq, scale),
    "pallas": (W_pad,),
    "pallas_int8": (Wq_pad, scale_pad),
    # unpadded tiles: 256 is the largest lane-multiple divisor of 250112 —
    # if it streams like VT=2048, integration needs no padded table copy
    "pallas_vt256": (W,),
    "pallas_i8_vt256": (Wq, scale),
}


def make_fn(variant: str, b: int):
    def head(x, tabs):
        if variant == "bf16":
            return (x @ tabs[0]).astype(jnp.float32)
        if variant == "bf16_T":
            return jax.lax.dot_general(x, tabs[0], (((1,), (1,)), ((), ())),
                                       preferred_element_type=jnp.float32)
        if variant == "int8":
            return (x @ tabs[0].astype(jnp.bfloat16)).astype(jnp.float32) \
                * tabs[1]
        if variant == "int8_mxu":
            from construction_clip_tpu.ops.quant import int8_linear
            return int8_linear(x, tabs[0], tabs[1], out_dtype=jnp.float32)
        if variant == "pallas":
            x8 = jnp.pad(x, ((0, 8 - b), (0, 0))) if b < 8 else x
            return _pallas_gemv(x8, tabs[0], None)[:b, :V]
        if variant == "pallas_int8":
            x8 = jnp.pad(x, ((0, 8 - b), (0, 0))) if b < 8 else x
            return _pallas_gemv(x8, tabs[0], tabs[1])[:b, :V]
        if variant == "pallas_vt256":
            x8 = jnp.pad(x, ((0, 8 - b), (0, 0))) if b < 8 else x
            return _pallas_gemv(x8, tabs[0], None, vt=256)[:b]
        if variant == "pallas_i8_vt256":
            x8 = jnp.pad(x, ((0, 8 - b), (0, 0))) if b < 8 else x
            return _pallas_gemv(x8, tabs[0], tabs[1], vt=256)[:b]
        raise ValueError(variant)

    @jax.jit
    def run(x0, *tabs):
        def body(i, carry):
            x, acc = carry
            logits = head(x.astype(jnp.bfloat16), tabs)
            nxt = jnp.argmax(logits, axis=-1)          # [b]
            # feed the result back into x: a real data dependency between
            # iterations, like the decode loop's token -> embedding path
            x = x + (nxt[:, None].astype(jnp.float32) * 1e-9)
            return x, acc + nxt
        x, acc = jax.lax.fori_loop(0, REP, body,
                                   (x0, jnp.zeros((x0.shape[0],), jnp.int32)))
        return acc

    return run


results = {"rep": REP, "d": D, "v": V}
for B in (1, 32):
    x0 = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    variants = os.environ.get(
        "AB_VARIANTS",
        "bf16,bf16_T,int8,int8_mxu,pallas,pallas_int8,"
        "pallas_vt256,pallas_i8_vt256").split(",")
    for variant in variants:
        fn = make_fn(variant, B)
        tabs = TABLES[variant]
        try:
            np.asarray(fn(x0, *tabs))  # compile
            st = timed_windows(lambda: fn(x0, *tabs), windows=5, iters=2,
                               warmup=2, sync=np.asarray)
            ms = st[0] * 1e3 / REP
            results[f"b{B}_{variant}_ms"] = round(ms, 4)
            log(f"B={B} {variant}: {ms:.4f} ms/apply")
        except Exception as e:
            log(f"B={B} {variant}: {type(e).__name__}: {str(e)[:300]}")
            results[f"b{B}_{variant}_error"] = type(e).__name__

print(json.dumps(results))

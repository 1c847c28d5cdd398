"""Streaming vocab-head GEMV for small-batch decode steps.

BASELINE.md ("mT5 B=1 decode floor"): the untied 250112x512 LM head is 62% of
mT5's B=1 cached decode step, and as an XLA GEMV it measured ~2x its 0.31 ms
HBM roofline (256 MB bf16 table read per step). This kernel streams the table
through VMEM in [D, vt] tiles with the activation panel resident — measured
0.695 ms vs 0.962 ms for the XLA op at B=1 (bf16, exact numerics) and
0.531 ms with an int8 table + f32 scale epilogue (tools/ab_t5_head.py, v5e).
At B>=32 XLA's GEMM matches or beats it, so callers gate on small B
(models/t5._head_logits uses it for cached single-token steps, B <= MAX_ROWS).

Reference workload: B=1 `generate` in
/root/reference/CLIP_prefix_caption/test_t5.py:245-249.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

MAX_ROWS = 8      # the small-B regime where this beats XLA (A/B'd on v5e)
TILE = 2048       # preferred V tile: 123 programs at mT5's padded vocab —
#                   0.700 ms/apply vs 0.888 for the 977-program VT=256 tiling
#                   of the raw 250112 vocab (grid overhead; tools/ab_t5_head)
_TILES = (2048, 1024, 512, 256, 128)


def _pick_tile(v: int) -> int | None:
    for vt in _TILES:
        if v % vt == 0:
            return vt
    return None


def pad_to_tile(table, scale=None, tile: int = TILE):
    """Zero-pad [D, V] to a V multiple of `tile`. Do this ONCE outside the
    decode loop (models/t5.prepare_decode_head) — padding per step would copy
    the 256 MB table every token. Padded columns produce logits 0; callers
    slice back to the true vocab before argmax/sampling."""
    v = table.shape[1]
    vp = ((v + tile - 1) // tile) * tile
    if vp == v:
        return table, scale
    table = jnp.pad(table, ((0, 0), (0, vp - v)))
    if scale is not None:
        scale = jnp.pad(scale, (0, vp - v))
    return table, scale


@functools.partial(jax.jit, static_argnames=("vt", "interpret"))
def _gemv(x8, table, scale, *, vt: int, interpret: bool = False):
    from jax.experimental import pallas as pl

    int8 = table.dtype == jnp.int8
    rows, d = x8.shape

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

    in_specs = [pl.BlockSpec((rows, d), lambda j: (0, 0)),
                pl.BlockSpec((d, vt), lambda j: (0, j))]
    args = [x8, table]
    if int8:
        in_specs.append(pl.BlockSpec((1, vt), lambda j: (0, j)))
        args.append(scale[None, :])
    return pl.pallas_call(
        kernel, grid=(table.shape[1] // vt,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rows, vt), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((rows, table.shape[1]), jnp.float32),
        interpret=interpret,
    )(*args)


def supported(batch: int, table) -> bool:
    """Kernel applicability: small B, lane-aligned tileable vocab, TPU-ish
    dtypes. CPU callers can still use it via interpret=True (tests)."""
    return (batch <= MAX_ROWS
            and table.ndim == 2
            and table.dtype in (jnp.bfloat16, jnp.int8)
            and _pick_tile(table.shape[1]) is not None)


def vocab_head_logits(x, table, scale=None, *, interpret: bool = False):
    """x [B, D] (bf16/f32), table [D, V] bf16 or int8 (+ scale [V]) ->
    [B, V] f32 logits. Caller checks supported() first; this pads B up to one
    sublane tile, runs the streaming kernel, and slices back."""
    b = x.shape[0]
    rows = max(8, b)
    x8 = jnp.pad(x.astype(jnp.bfloat16), ((0, rows - b), (0, 0))) \
        if b < rows else x.astype(jnp.bfloat16)
    vt = _pick_tile(table.shape[1])
    out = _gemv(x8, table,
                scale if scale is None else scale.astype(jnp.float32),
                vt=vt, interpret=interpret)
    return out[:b]

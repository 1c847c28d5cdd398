"""Fused pre-norm MLP residual: out = x + W2 @ act(W1 @ LN(x)) in one Pallas kernel.

Per transformer block XLA runs the MLP as separate HLOs with the [rows, 4D] hidden
activation round-tripping HBM (at ViT-B/32 batch 256 that's ~78 MB per layer each
way). This kernel tiles over row panels with BOTH weight matrices held in VMEM
(constant index_map blocks load once and stay resident): x is read once, the hidden
never leaves VMEM, and the residual add fuses into the output write.

LayerNorm statistics accumulate in fp32 inside the kernel (parity with ops/norms).
Differentiable via custom_vjp (analytic jnp backward, recompute-LN strategy).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from construction_clip_tpu.ops.activations import quick_gelu


def _kernel(x_ref, scale_ref, bias_ref, wfc_ref, bfc_ref, wproj_ref, bproj_ref,
            out_ref, *, eps: float):
    x = x_ref[:]
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    h = (x32 - mean) * jax.lax.rsqrt(var + eps)
    h = h * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)
    h = h.astype(x.dtype)
    h = quick_gelu(
        jnp.dot(h, wfc_ref[:], preferred_element_type=jnp.float32).astype(x.dtype)
        + bfc_ref[:])
    y = jnp.dot(h, wproj_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = (x32 + y + bproj_ref[:].astype(jnp.float32)).astype(out_ref.dtype)


def _forward(x, ln_scale, ln_bias, w_fc, b_fc, w_proj, b_proj, eps: float):
    b, t, d = x.shape
    hidden = w_fc.shape[1]
    rows = b * t
    xf = x.reshape(rows, d)
    block = 512
    while rows % block and block > 8:
        block //= 2
    if rows % block:
        block = rows  # tiny inputs: single tile
    grid = (rows // block,)
    row_spec = pl.BlockSpec((block, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((rows, d), x.dtype),
        grid=grid,
        in_specs=[row_spec, const((d,)), const((d,)), const((d, hidden)),
                  const((hidden,)), const((hidden, d)), const((d,))],
        out_specs=row_spec,
        cost_estimate=pl.CostEstimate(
            flops=4 * rows * d * hidden,
            bytes_accessed=2 * rows * d * x.dtype.itemsize
            + 2 * d * hidden * w_fc.dtype.itemsize,
            transcendentals=rows * hidden,
        ),
    )(xf, ln_scale, ln_bias, w_fc, b_fc, w_proj, b_proj)
    return out.reshape(b, t, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _fused(x, ln_scale, ln_bias, w_fc, b_fc, w_proj, b_proj, eps):
    return _forward(x, ln_scale, ln_bias, w_fc, b_fc, w_proj, b_proj, eps)


def _ref_math(x, ln_scale, ln_bias, w_fc, b_fc, w_proj, b_proj, eps):
    from construction_clip_tpu.ops.norms import layer_norm

    h = layer_norm(x, ln_scale, ln_bias, eps=eps)
    h = quick_gelu(h @ w_fc + b_fc)
    return x + h @ w_proj + b_proj


def _fused_fwd(x, ln_scale, ln_bias, w_fc, b_fc, w_proj, b_proj, eps):
    out = _fused(x, ln_scale, ln_bias, w_fc, b_fc, w_proj, b_proj, eps)
    return out, (x, ln_scale, ln_bias, w_fc, b_fc, w_proj, b_proj)


def _fused_bwd(eps, res, g):
    # backward = autodiff of the reference math with recompute (XLA fuses this fine;
    # the forward's HBM savings are where the win is)
    x, ln_scale, ln_bias, w_fc, b_fc, w_proj, b_proj = res
    _, vjp = jax.vjp(
        lambda *args: _ref_math(*args, eps), x, ln_scale, ln_bias, w_fc, b_fc,
        w_proj, b_proj)
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_mlp_residual(x, mlp_params, ln_params, *, eps: float = 1e-5):
    """x [B,T,D]; params as in models/blocks (w_fc [D,H], w_proj [H,D], ln scale/bias).
    Returns x + MLP(LN(x)) — QuickGELU activation."""
    return _fused(x, ln_params["scale"], ln_params["bias"], mlp_params["w_fc"],
                  mlp_params["b_fc"], mlp_params["w_proj"], mlp_params["b_proj"],
                  eps)


def supported(x, w_fc) -> bool:
    if x.ndim != 3:
        return False
    if x.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    d, hidden = w_fc.shape
    # both weights + one row panel must fit VMEM comfortably
    return (d * hidden * 2 * x.dtype.itemsize) <= 12 * 1024 * 1024

"""Pre-norm transformer blocks, stacked for `lax.scan`.

All transformer stacks in this framework (CLIP vision tower, CLIP text tower, the
ClipCap TransformerMapper) share this block: LN -> fused-QKV attention -> residual,
LN -> MLP(act) -> residual. Parameters for L layers are stored STACKED along a leading
axis so the whole stack applies as one `lax.scan` — one trace/compile of the block
regardless of depth, uniform sharding annotations per leaf, and `jax.checkpoint`
rematerialisation appliable per scan step.

The reference's equivalents are torch nn.Modules inside the `clip` pip package
(ResidualAttentionBlock) and reference CLIP_prefix_caption/train.py:175-231
(TransformerLayer/Transformer for the mapper).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from construction_clip_tpu.ops.attention import qkv_attention
from construction_clip_tpu.ops.norms import layer_norm


def init_block(key, width: int, mlp_ratio: float = 4.0, dtype=jnp.float32):
    """One pre-norm block's params. y = x @ W convention ([in, out] weights)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    hidden = int(width * mlp_ratio)
    std = width ** -0.5
    return {
        "ln_1": {"scale": jnp.ones((width,), dtype), "bias": jnp.zeros((width,), dtype)},
        "attn": {
            "w_qkv": (jax.random.normal(k1, (width, 3 * width)) * std).astype(dtype),
            "b_qkv": jnp.zeros((3 * width,), dtype),
            "w_out": (jax.random.normal(k2, (width, width)) * std).astype(dtype),
            "b_out": jnp.zeros((width,), dtype),
        },
        "ln_2": {"scale": jnp.ones((width,), dtype), "bias": jnp.zeros((width,), dtype)},
        "mlp": {
            "w_fc": (jax.random.normal(k3, (width, hidden)) * std).astype(dtype),
            "b_fc": jnp.zeros((hidden,), dtype),
            "w_proj": (jax.random.normal(k4, (hidden, width)) * (hidden ** -0.5)).astype(dtype),
            "b_proj": jnp.zeros((width,), dtype),
        },
    }


def init_stack(key, layers: int, width: int, mlp_ratio: float = 4.0, dtype=jnp.float32):
    """Stacked params: every leaf has leading dim `layers`."""
    keys = jax.random.split(key, layers)
    blocks = [init_block(k, width, mlp_ratio, dtype) for k in keys]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)


def apply_block(
    params,
    x,
    *,
    n_heads: int,
    act: Callable,
    bias=None,
    is_causal: bool = False,
    ln_eps: float = 1e-5,
    return_probs: bool = False,
    probs_probe=None,
):
    probs = None
    if bias is None and not return_probs and probs_probe is None:
        from construction_clip_tpu.ops import pallas_attention_block as fab
        from construction_clip_tpu.ops.attention import resolve_impl

        if resolve_impl() == "pallas" and fab.supported(x, n_heads):
            # fully-fused LN+QKV+MHA+proj+residual (31% faster than the
            # composable path at encoder shapes — see the module docstring).
            # Name the block OUTPUT for selective remat: the fused kernel
            # never materializes qkv, so the "qkv" checkpoint name cannot
            # exist on this path (save_qkv degrades to recomputing the fused
            # block — see apply_stack's remat docstring); "attn_out" still
            # lets save_big skip that recompute.
            from jax.ad_checkpoint import checkpoint_name

            x = checkpoint_name(
                fab.fused_attention_block(x, params["ln_1"], params["attn"],
                                          n_heads=n_heads, causal=is_causal,
                                          eps=ln_eps), "attn_out")
            return _mlp_residual(x, params, act, ln_eps)
    h = layer_norm(x, **params["ln_1"], eps=ln_eps)
    attn_out = qkv_attention(h, params["attn"], n_heads, bias=bias,
                             is_causal=is_causal, return_probs=return_probs,
                             probs_probe=probs_probe)
    if return_probs:
        attn_out, probs = attn_out
    from jax.ad_checkpoint import checkpoint_name

    attn_out = checkpoint_name(attn_out, "attn_out")
    x = x + attn_out
    x = _mlp_residual(x, params, act, ln_eps)
    if return_probs:
        return x, probs
    return x


USE_FUSED_MLP = False  # A/B on v5e (batch-256 ViT-B/32): XLA's own MLP fusion wins
#                        (26.2 ms vs 27.9 ms with ops/pallas_mlp) — kernel stays
#                        available as an opt-in for other shapes/hardware.


def _mlp_residual(x, params, act, ln_eps):
    """x + MLP(LN2(x)); opt-in fused Pallas kernel for the QuickGELU path
    (ops/pallas_mlp.py: weights VMEM-resident, hidden never touches HBM)."""
    from construction_clip_tpu.ops.activations import quick_gelu as _qg

    if USE_FUSED_MLP and act is _qg:
        from construction_clip_tpu.ops import pallas_mlp
        from construction_clip_tpu.ops.attention import resolve_impl

        if resolve_impl() == "pallas" and pallas_mlp.supported(x, params["mlp"]["w_fc"]):
            return pallas_mlp.fused_mlp_residual(x, params["mlp"], params["ln_2"],
                                                 eps=ln_eps)
    h = layer_norm(x, **params["ln_2"], eps=ln_eps)
    from jax.ad_checkpoint import checkpoint_name

    # named for selective remat. Saving the PRE-activation dominates saving the
    # post-act hidden at equal memory: backward needs act'(preact) regardless,
    # so a saved hidden still forces the fc GEMM recompute to rebuild preact,
    # while a saved preact reduces the recompute to elementwise act/act'.
    pre = checkpoint_name(h @ params["mlp"]["w_fc"] + params["mlp"]["b_fc"],
                          "mlp_preact")
    h = checkpoint_name(act(pre), "mlp_hidden")
    return x + (h @ params["mlp"]["w_proj"] + params["mlp"]["b_proj"])


def apply_stack(
    stacked_params,
    x,
    *,
    n_heads: int,
    act: Callable,
    bias=None,
    is_causal: bool = False,
    ln_eps: float = 1e-5,
    return_probs: bool = False,
    probs_probe=None,
    remat: bool | str = False,
    unroll: int | None = None,
):
    """Apply L stacked blocks via lax.scan.

    With return_probs=True also returns attention probabilities stacked [L, B, H, T, T]
    (the probe mode that powers relevance-propagation explainability).
    probs_probe: zeros [L, B, H, T, T]; grad w.r.t. it = grad w.r.t. per-layer probs.

    remat: False = no rematerialisation; True = full per-layer checkpoint (save
    only layer inputs, recompute everything in backward); or a SELECTIVE policy
    name trading memory for recompute (measured for ViT-L/14, BASELINE.md):
      "save_qkv"        keep each layer's fused qkv projection. NOTE: on the
                        fused-attention-block path (T<=256 towers) qkv never
                        materializes, so there save_qkv recomputes the fused
                        block in backward (== full remat for the attention
                        half); it takes full effect on the large-T towers
                        (e.g. ViT-L/14's T=257 image tower) where remat
                        matters most
      "save_mlp_hidden" keep each layer's 4d MLP hidden
      "save_preact"     keep only each layer's 4d MLP pre-activation — the
                        middle-memory option (~135 MB/layer at ViT-L b=64)
                        when save_attn_preact does not fit
      "save_attn_preact" keep each layer's attention-residual output + 4d MLP
                        PRE-activation (~169 MB/layer at ViT-L b=64): backward
                        recompute drops to the qkv projection + attention fwd
                        (for the weight-grad operands) + elementwise act —
                        the fc GEMM recompute disappears because act' needs
                        only the saved preact
      "save_qkv_attn_out" keep qkv + the post-proj attention output
                        (~135 MB/layer at ViT-L b=64 — same memory as
                        save_preact): backward recompute drops to LN2 + the
                        fc GEMM + act. Saving attn_out (not probs) matters
                        because the flash-attention VJP only needs q,k,v —
                        its in-kernel probs recompute is inherent — while the
                        layer re-forward would otherwise run the whole padded
                        T=257 attention core AGAIN just to rebuild the
                        residual stream for the MLP backward
      "save_qkv_mlp"    keep qkv + mlp_hidden — skips the two widest recompute
                        GEMMs (~85% of the per-layer recompute FLOPs) for
                        ~236 MB/layer at ViT-L b=64
      "save_big"        keep qkv + mlp_hidden + attn_out (cheapest recompute,
                        ~270 MB/layer at ViT-L b=64)
      "dots"            XLA policy: save every dot_general result

    unroll: scan unroll factor; None resolves to FULL unroll on non-remat TPU
    stacks (measured on v5e, ViT-B shapes b=128: fwd+bwd 45.1 -> 34.4 ms image /
    33.1 -> 24.2 ms text — XLA optimizes layouts across unrolled layers; PARTIAL
    unroll (2/4) is pathologically WORSE than no unroll, so only 1 or L are sane
    values) and 1 elsewhere. Under remat the direction REVERSES: unroll=1 keeps
    a per-layer backward schedule and measured 392.3 vs 399.5 ms/step on the
    ViT-L/14 b=64 save_preact step in one A/B run (_drive_vitl_unroll.py) —
    consistent with the remat-policy sweep finding that XLA's backward schedule,
    not recompute FLOPs, controls rematted step time.
    """

    def body(carry, layer):
        if probs_probe is not None:
            layer_params, probe = layer
        else:
            layer_params, probe = layer, None
        out = apply_block(layer_params, carry, n_heads=n_heads, act=act, bias=bias,
                          is_causal=is_causal, ln_eps=ln_eps,
                          return_probs=return_probs, probs_probe=probe)
        if return_probs:
            new_x, probs = out
            return new_x, probs
        return out, None

    if remat:
        if isinstance(remat, str):
            cp = jax.checkpoint_policies
            policy = {
                "dots": cp.checkpoint_dots,
                "save_qkv": cp.save_only_these_names("qkv"),
                "save_mlp_hidden": cp.save_only_these_names("mlp_hidden"),
                "save_qkv_attn_out": cp.save_only_these_names("qkv", "attn_out"),
                "save_qkv_mlp": cp.save_only_these_names("qkv", "mlp_hidden"),
                "save_attn_preact": cp.save_only_these_names("attn_out",
                                                             "mlp_preact"),
                "save_preact": cp.save_only_these_names("mlp_preact"),
                "save_big": cp.save_only_these_names("qkv", "mlp_hidden",
                                                     "attn_out"),
            }[remat]
            body = jax.checkpoint(body, policy=policy)
        else:
            body = jax.checkpoint(body)
    if unroll is None:
        n_layers = jax.tree.leaves(stacked_params)[0].shape[0]
        unroll = n_layers if (jax.default_backend() == "tpu" and not remat) else 1
    xs = (stacked_params, probs_probe) if probs_probe is not None else stacked_params
    x, probs = jax.lax.scan(body, x, xs, unroll=unroll)
    if return_probs:
        return x, probs
    return x

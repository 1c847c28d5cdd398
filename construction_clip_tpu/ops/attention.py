"""Multi-head attention.

Two execution paths behind one API:
  - "xla": the reference-numerics path — plain einsum + fp32 softmax. XLA already fuses
    this well for the short sequences in this workload (<=77 text tokens, 50 image
    patches, <=140 decode positions; see SURVEY.md §5 "long-context absent").
  - "pallas": fused flash-style kernel for the image-tower hot path
    (construction_clip_tpu.ops.pallas_attention), used when shapes are MXU-friendly.

The reference gets attention from torch's nn.MultiheadAttention inside the `clip` pip
package and from HF GPT-2/mT5 (e.g. reference CLIP_prefix_caption/train.py:143-172
hand-rolls an einsum MHA for the mapper). Here attention is one op owned by the
framework, with a `return_probs` probe mode that powers relevance-propagation
explainability (reference attention.py:32-45 needs per-block attention probabilities).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_IMPL = None  # resolved lazily: "pallas" on TPU, "xla" elsewhere; set_impl overrides


def set_impl(name: str) -> None:
    global _IMPL
    assert name in ("xla", "pallas")
    _IMPL = name


def resolve_impl() -> str:
    """Default: the fused Pallas kernel on TPU (measured +6% end-to-end on the
    ViT-B/32 encode and ~200x faster to compile through the TPU runtime), XLA
    einsum path elsewhere (CPU tests, interpret-mode-free)."""
    global _IMPL
    if _IMPL is None:
        _IMPL = "pallas" if jax.default_backend() == "tpu" else "xla"
    return _IMPL


def causal_mask(q_len: int, kv_len: int, *, offset: int = 0, dtype=jnp.float32):
    """Additive causal bias [q_len, kv_len]; `offset` = absolute position of query 0."""
    q_pos = jax.lax.broadcasted_iota(jnp.int32, (q_len, kv_len), 0) + offset
    k_pos = jax.lax.broadcasted_iota(jnp.int32, (q_len, kv_len), 1)
    return jnp.where(q_pos >= k_pos, 0.0, jnp.finfo(dtype).min).astype(dtype)


def make_attention_bias(padding_mask, dtype=jnp.float32):
    """[B, kv_len] bool/0-1 padding mask -> additive bias [B, 1, 1, kv_len]."""
    bias = jnp.where(padding_mask.astype(bool), 0.0, jnp.finfo(dtype).min)
    return bias.astype(dtype)[:, None, None, :]


def mha(
    q,
    k,
    v,
    *,
    bias: Optional[jax.Array] = None,
    is_causal: bool = False,
    scale: Optional[float] = None,
    return_probs: bool = False,
    probs_probe: Optional[jax.Array] = None,
    impl: Optional[str] = None,
):
    """Scaled dot-product attention over [B, H, T, D] tensors.

    bias: additive, broadcastable to [B, H, Tq, Tk] (use jnp.finfo.min for masked).
    Softmax accumulates in fp32; output is cast back to q.dtype.
    probs_probe: zeros [B, H, Tq, Tk] added to the attention probabilities — a
    differentiation port: grad w.r.t. the probe IS grad w.r.t. the attention
    probabilities (powers relevance-propagation explainability, infer/explain.py).
    """
    impl = impl or resolve_impl()
    if scale is None:
        scale = q.shape[-1] ** -0.5

    if impl == "pallas" and not return_probs and probs_probe is None:
        from construction_clip_tpu.ops.pallas_attention import flash_attention, supported

        if supported(q, k, v, bias=bias):
            return flash_attention(q, k, v, bias=bias, is_causal=is_causal, scale=scale)

    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if is_causal:
        logits = logits + causal_mask(q.shape[2], k.shape[2], dtype=jnp.float32)
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    if probs_probe is not None:
        probs = probs + probs_probe.astype(probs.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    if return_probs:
        return out, probs
    return out


def split_heads(x, n_heads: int):
    """[B, T, D] -> [B, H, T, D/H]"""
    b, t, d = x.shape
    return x.reshape(b, t, n_heads, d // n_heads).transpose(0, 2, 1, 3)


def merge_heads(x):
    """[B, H, T, Dh] -> [B, T, H*Dh]"""
    b, h, t, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * dh)


def qkv_attention(
    x,
    params,
    n_heads: int,
    *,
    kv_x=None,
    bias=None,
    is_causal: bool = False,
    return_probs: bool = False,
    probs_probe: Optional[jax.Array] = None,
    impl: Optional[str] = None,
):
    """Full attention layer: fused-qkv projection -> mha -> output projection.

    params: {"w_qkv": [D, 3D], "b_qkv": [3D], "w_out": [D, D], "b_out": [D]}
    (weights stored input-major: y = x @ W + b).
    Self-attention when kv_x is None; cross-attention projects k,v from kv_x.
    """
    d = x.shape[-1]
    if kv_x is None:
        qkv = x @ params["w_qkv"] + params["b_qkv"]
        # named for selective rematerialisation (models/blocks.apply_stack
        # remat="save_qkv"/"save_big"): saving qkv lets the backward skip the
        # widest projection GEMM recompute
        from jax.ad_checkpoint import checkpoint_name

        qkv = checkpoint_name(qkv, "qkv")
        q, k, v = jnp.split(qkv, 3, axis=-1)
    else:
        wq, wk, wv = jnp.split(params["w_qkv"], 3, axis=-1)
        bq, bk, bv = jnp.split(params["b_qkv"], 3, axis=-1)
        q = x @ wq + bq
        k = kv_x @ wk + bk
        v = kv_x @ wv + bv
    q, k, v = (split_heads(t, n_heads) for t in (q, k, v))
    out = mha(q, k, v, bias=bias, is_causal=is_causal, return_probs=return_probs,
              probs_probe=probs_probe, impl=impl)
    if return_probs:
        out, probs = out
    y = merge_heads(out) @ params["w_out"] + params["b_out"]
    if return_probs:
        return y, probs
    return y

"""int8 serving path for the CLIP image tower.

All four big GEMMs per layer (QKV, out-proj, MLP fc/proj) plus patch-embed and
the final projection run as int8 MXU matmuls (measured 379-439 TOP/s on v5e vs
151 TFLOP/s bf16 — ops/quant.py). The QKV/out GEMMs run inside the fused int8
Pallas attention block (ops/pallas_attention_block_int8.py); per-head attention
math and LN/softmax stay bf16/fp32 (latency-bound at T=50, int8 buys nothing).

The reference has no quantized inference (fp32 torch on one GPU); this is the
TPU-native serving configuration of the same model. Weight layout follows
models/clip/model.py; weights convert from the same checkpoints then quantize.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from construction_clip_tpu.core.configs import CLIPConfig
from construction_clip_tpu.models.clip.model import patchify
from construction_clip_tpu.ops.activations import quick_gelu
from construction_clip_tpu.ops.norms import layer_norm
from construction_clip_tpu.ops.quant import int8_linear, quantize_tree

_QUANT_PATHS = (
    ("vision", "patch_embed"),
    ("vision", "blocks", "attn", "w_qkv"),
    ("vision", "blocks", "attn", "w_out"),
    ("vision", "blocks", "mlp", "w_fc"),
    ("vision", "blocks", "mlp", "w_proj"),
    ("vision", "proj"),
)


def quantize_clip(params):
    """Full-precision CLIP params -> int8-serving params: the vision MLP stack,
    patch embed, and output projection become {"q": int8, "s": fp32-scale}
    leaves; every other float leaf is cast to bf16 (inference-style weights)."""
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating) else x,
        params)
    return quantize_tree(params, _QUANT_PATHS)


def _attn_residual_q(x, ln_1, qattn, n_heads: int, eps: float = 1e-5):
    """Quantized attention block: fused int8 Pallas kernel on TPU, equivalent
    int8_linear composable math elsewhere (CPU tests / unsupported shapes)."""
    from construction_clip_tpu.ops import pallas_attention_block_int8 as fab8
    from construction_clip_tpu.ops.attention import resolve_impl

    if resolve_impl() == "pallas" and fab8.supported(x, n_heads):
        return fab8.fused_attention_block_int8(x, ln_1, qattn, n_heads=n_heads,
                                               eps=eps)
    h = layer_norm(x, **ln_1, eps=eps)
    qkv = int8_linear(h, qattn["w_qkv"]["q"], qattn["w_qkv"]["s"],
                      qattn["b_qkv"], out_dtype=x.dtype)
    b, t, d = x.shape
    dh = d // n_heads
    q, k, v = (z.reshape(b, t, n_heads, dh).transpose(0, 2, 1, 3)
               for z in jnp.split(qkv, 3, axis=-1))
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * dh ** -0.5
    p = jax.nn.softmax(logits, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    merged = o.transpose(0, 2, 1, 3).reshape(b, t, d)
    return x + int8_linear(merged, qattn["w_out"]["q"], qattn["w_out"]["s"],
                           qattn["b_out"], out_dtype=x.dtype)


def encode_image_int8(qparams, cfg: CLIPConfig, images, *, normalize: bool = False):
    """images [B, H, W, 3] float -> [B, embed_dim] bf16 features.

    Same math as models/clip/model.py:encode_image with the MLP/patch/proj GEMMs
    in dynamic-activation int8.
    """
    v = cfg.vision
    p = qparams["vision"]
    act = quick_gelu if cfg.quick_gelu else jax.nn.gelu

    x = patchify(images.astype(jnp.bfloat16), v.patch_size)
    x = int8_linear(x, p["patch_embed"]["q"], p["patch_embed"]["s"],
                    out_dtype=jnp.bfloat16)
    cls = jnp.broadcast_to(p["class_emb"], (x.shape[0], 1, v.width))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + p["pos_emb"]
    x = layer_norm(x, **p["ln_pre"])

    def body(h, lp):
        h = _attn_residual_q(h, lp["ln_1"], lp["attn"], v.heads)
        y = layer_norm(h, **lp["ln_2"])
        y = act(int8_linear(y, lp["mlp"]["w_fc"]["q"], lp["mlp"]["w_fc"]["s"],
                            lp["mlp"]["b_fc"], out_dtype=jnp.bfloat16))
        h = h + int8_linear(y, lp["mlp"]["w_proj"]["q"], lp["mlp"]["w_proj"]["s"],
                            lp["mlp"]["b_proj"], out_dtype=jnp.bfloat16)
        return h, None

    unroll = v.layers if jax.default_backend() == "tpu" else 1
    x, _ = jax.lax.scan(body, x, p["blocks"], unroll=unroll)

    x = layer_norm(x[:, 0, :], **p["ln_post"])
    feats = int8_linear(x, p["proj"]["q"], p["proj"]["s"], out_dtype=jnp.bfloat16)
    if normalize:
        feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
    return feats

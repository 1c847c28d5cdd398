"""OpenAI-CLIP-compatible two-tower model, functional JAX.

Architecture parity targets (behavior the reference gets from `clip.load("ViT-B/32")`,
reference CLIP/train.py:105 and CLIP/predict.py:12):
  vision: 32x32 conv patch embed (no bias) -> [CLS] + pos embed -> ln_pre ->
          12x pre-norm blocks (QuickGELU) -> ln_post on CLS -> projection to 512.
  text:   token embed + pos embed -> 12x causal pre-norm blocks -> ln_final ->
          features taken at the argmax token id (EOT has the largest BPE id) -> proj.
  forward(image, text) -> (logits_per_image, logits_per_text), cosine similarities
          scaled by exp(logit_scale), features L2-normalized
          (reference CLIP/train.py:161, predict.py:33).

TPU-first choices: NHWC images; patch embedding as a reshape+matmul (maps straight onto
the MXU instead of a conv); layers stacked and applied with lax.scan; bf16 compute with
fp32 softmax/LN under Policy.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from construction_clip_tpu.core.configs import CLIPConfig
from construction_clip_tpu.core.precision import Policy, DEFAULT_POLICY
from construction_clip_tpu.models.blocks import init_stack, apply_stack
from construction_clip_tpu.ops.activations import quick_gelu
from construction_clip_tpu.ops.norms import layer_norm


def _ln_params(width, dtype):
    return {"scale": jnp.ones((width,), dtype), "bias": jnp.zeros((width,), dtype)}


def init_clip(key, cfg: CLIPConfig, dtype=jnp.float32):
    kv, kt = jax.random.split(key)
    v, t = cfg.vision, cfg.text
    kv1, kv2, kv3, kv4, kv5 = jax.random.split(kv, 5)
    kt1, kt2, kt3, kt4 = jax.random.split(kt, 4)
    patch_dim = 3 * v.patch_size * v.patch_size
    vision = {
        # patch embedding as a matmul over unfolded patches: [patch_dim, width]
        "patch_embed": (jax.random.normal(kv1, (patch_dim, v.width)) * (v.width ** -0.5)).astype(dtype),
        "class_emb": (jax.random.normal(kv2, (v.width,)) * (v.width ** -0.5)).astype(dtype),
        "pos_emb": (jax.random.normal(kv3, (v.seq_len, v.width)) * (v.width ** -0.5)).astype(dtype),
        "ln_pre": _ln_params(v.width, dtype),
        "blocks": init_stack(kv5, v.layers, v.width, dtype=dtype),
        "ln_post": _ln_params(v.width, dtype),
        "proj": (jax.random.normal(kv4, (v.width, v.embed_dim)) * (v.width ** -0.5)).astype(dtype),
    }
    text = {
        "tok_emb": (jax.random.normal(kt1, (t.vocab_size, t.width)) * 0.02).astype(dtype),
        "pos_emb": (jax.random.normal(kt2, (t.context_length, t.width)) * 0.01).astype(dtype),
        "blocks": init_stack(kt3, t.layers, t.width, dtype=dtype),
        "ln_final": _ln_params(t.width, dtype),
        "proj": (jax.random.normal(kt4, (t.width, t.embed_dim)) * (t.width ** -0.5)).astype(dtype),
    }
    return {
        "vision": vision,
        "text": text,
        "logit_scale": jnp.asarray(cfg.logit_scale_init, dtype=jnp.float32),
    }


def patchify(images, patch_size: int):
    """[B, H, W, 3] -> [B, n_patches, 3*p*p], row-major patch order.

    Feature order within a patch matches a torch Conv2d(3,width,p,p) kernel flattened
    as (C, ph, pw) — the converter relies on this (see convert.py).
    """
    b, h, w, c = images.shape
    gh, gw = h // patch_size, w // patch_size
    x = images.reshape(b, gh, patch_size, gw, patch_size, c)
    # -> [B, gh, gw, C, ph, pw] so flattening the last 3 dims gives (C, ph, pw) order
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, gh * gw, c * patch_size * patch_size)


def encode_image(
    params,
    cfg: CLIPConfig,
    images,
    *,
    policy: Policy = DEFAULT_POLICY,
    normalize: bool = False,
    return_probs: bool = False,
    probs_probe=None,
    remat: bool = False,
):
    """images: [B, H, W, 3] float (already preprocessed). Returns [B, embed_dim]."""
    v = cfg.vision
    p = policy.cast_to_compute(params["vision"])
    x = patchify(images.astype(policy.compute_dtype), v.patch_size)
    x = x @ p["patch_embed"]
    cls = jnp.broadcast_to(p["class_emb"], (x.shape[0], 1, v.width))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + p["pos_emb"]
    x = layer_norm(x, **p["ln_pre"])
    out = apply_stack(p["blocks"], x, n_heads=v.heads,
                      act=quick_gelu if cfg.quick_gelu else jax.nn.gelu,
                      return_probs=return_probs, probs_probe=probs_probe, remat=remat)
    probs = None
    if return_probs:
        out, probs = out
    x = layer_norm(out[:, 0, :], **p["ln_post"])
    feats = policy.cast_to_output(x @ p["proj"])
    if normalize:
        feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
    if return_probs:
        return feats, probs
    return feats


def encode_text(
    params,
    cfg: CLIPConfig,
    tokens,
    *,
    policy: Policy = DEFAULT_POLICY,
    normalize: bool = False,
    return_probs: bool = False,
    probs_probe=None,
):
    """tokens: [B, context_length] int32. Returns [B, embed_dim].

    Feature is taken at argmax(tokens) — the EOT position, as the OpenAI model does.
    """
    t = cfg.text
    p = policy.cast_to_compute(params["text"])
    x = p["tok_emb"][tokens]
    x = x + p["pos_emb"][: tokens.shape[1]]
    out = apply_stack(p["blocks"], x, n_heads=t.heads,
                      act=quick_gelu if cfg.quick_gelu else jax.nn.gelu,
                      is_causal=True, return_probs=return_probs,
                      probs_probe=probs_probe)
    probs = None
    if return_probs:
        out, probs = out
    x = layer_norm(out, **p["ln_final"])
    eot = jnp.argmax(tokens, axis=-1)
    x = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0, :]
    feats = policy.cast_to_output(x @ p["proj"])
    if normalize:
        feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
    if return_probs:
        return feats, probs
    return feats


def clip_forward(params, cfg: CLIPConfig, images, tokens, *,
                 policy: Policy = DEFAULT_POLICY, remat: bool = False):
    """(logits_per_image [B_i, B_t], logits_per_text [B_t, B_i]) — reference
    CLIP/train.py:161 contract."""
    img = encode_image(params, cfg, images, policy=policy, normalize=True, remat=remat)
    txt = encode_text(params, cfg, tokens, policy=policy, normalize=True)
    scale = jnp.exp(params["logit_scale"])
    logits_per_image = scale * img @ txt.T
    return logits_per_image, logits_per_image.T

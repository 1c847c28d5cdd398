"""Checkpoint converters: OpenAI `clip` / HF `CLIPModel` state dicts -> our pytree.

The reference loads OpenAI weights with `clip.load("ViT-B/32")` and fine-tuned
state_dicts with `model.load_state_dict(torch.load(...))` (reference CLIP/train.py:105-111);
users of this framework bring the same .pt files, so both naming schemes are supported:

  OpenAI: visual.conv1.weight, visual.transformer.resblocks.{i}.attn.in_proj_weight, ...
  HF:     vision_model.encoder.layers.{i}.self_attn.q_proj.weight, ...

Our layout (see model.init_clip): weights input-major ([in, out], y = x @ W), per-layer
params STACKED along a leading L axis for lax.scan.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np
import jax.numpy as jnp

from construction_clip_tpu.core.configs import CLIPConfig, VisionConfig, TextConfig


def _np(x):
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _stack(blocks):
    import jax

    return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)


def _ln(sd, prefix):
    return {"scale": jnp.asarray(_np(sd[prefix + ".weight"])),
            "bias": jnp.asarray(_np(sd[prefix + ".bias"]))}


def _conv_to_patch_embed(w):
    """torch conv kernel [width, C, p, p] -> [C*p*p, width] matching model.patchify."""
    w = _np(w)
    width = w.shape[0]
    return jnp.asarray(w.reshape(width, -1).T)  # flatten (C, ph, pw) then transpose


def config_from_openai_state_dict(sd: Mapping) -> CLIPConfig:
    """Infer architecture from an OpenAI-format state dict (ViT variants only)."""
    width = _np(sd["visual.conv1.weight"]).shape[0]
    patch = _np(sd["visual.conv1.weight"]).shape[-1]
    n_pos = _np(sd["visual.positional_embedding"]).shape[0]
    image_size = patch * int(round((n_pos - 1) ** 0.5))
    v_layers = len({k.split(".")[3] for k in sd if k.startswith("visual.transformer.resblocks.")})
    t_layers = len({k.split(".")[2] for k in sd if k.startswith("transformer.resblocks.")})
    embed_dim = _np(sd["text_projection"]).shape[1]
    t_width = _np(sd["token_embedding.weight"]).shape[1]
    vocab = _np(sd["token_embedding.weight"]).shape[0]
    ctx = _np(sd["positional_embedding"]).shape[0]
    return CLIPConfig(
        vision=VisionConfig(image_size=image_size, patch_size=patch, width=width,
                            layers=v_layers, heads=width // 64, embed_dim=embed_dim),
        text=TextConfig(vocab_size=vocab, context_length=ctx, width=t_width,
                        layers=t_layers, heads=t_width // 64, embed_dim=embed_dim),
    )


def _openai_block(sd, prefix):
    # torch Linear weights are [out, in]; ours are [in, out] -> transpose.
    return {
        "ln_1": _ln(sd, prefix + ".ln_1"),
        "attn": {
            "w_qkv": jnp.asarray(_np(sd[prefix + ".attn.in_proj_weight"]).T),
            "b_qkv": jnp.asarray(_np(sd[prefix + ".attn.in_proj_bias"])),
            "w_out": jnp.asarray(_np(sd[prefix + ".attn.out_proj.weight"]).T),
            "b_out": jnp.asarray(_np(sd[prefix + ".attn.out_proj.bias"])),
        },
        "ln_2": _ln(sd, prefix + ".ln_2"),
        "mlp": {
            "w_fc": jnp.asarray(_np(sd[prefix + ".mlp.c_fc.weight"]).T),
            "b_fc": jnp.asarray(_np(sd[prefix + ".mlp.c_fc.bias"])),
            "w_proj": jnp.asarray(_np(sd[prefix + ".mlp.c_proj.weight"]).T),
            "b_proj": jnp.asarray(_np(sd[prefix + ".mlp.c_proj.bias"])),
        },
    }


def from_openai_state_dict(sd: Mapping, cfg: CLIPConfig | None = None):
    if cfg is None:
        cfg = config_from_openai_state_dict(sd)
    v, t = cfg.vision, cfg.text
    vision = {
        "patch_embed": _conv_to_patch_embed(sd["visual.conv1.weight"]),
        "class_emb": jnp.asarray(_np(sd["visual.class_embedding"])),
        "pos_emb": jnp.asarray(_np(sd["visual.positional_embedding"])),
        "ln_pre": _ln(sd, "visual.ln_pre"),
        "blocks": _stack([_openai_block(sd, f"visual.transformer.resblocks.{i}")
                          for i in range(v.layers)]),
        "ln_post": _ln(sd, "visual.ln_post"),
        "proj": jnp.asarray(_np(sd["visual.proj"])),  # already [width, embed]
    }
    text = {
        "tok_emb": jnp.asarray(_np(sd["token_embedding.weight"])),
        "pos_emb": jnp.asarray(_np(sd["positional_embedding"])),
        "blocks": _stack([_openai_block(sd, f"transformer.resblocks.{i}")
                          for i in range(t.layers)]),
        "ln_final": _ln(sd, "ln_final"),
        "proj": jnp.asarray(_np(sd["text_projection"])),  # already [width, embed]
    }
    params = {"vision": vision, "text": text,
              "logit_scale": jnp.asarray(float(_np(sd["logit_scale"])), dtype=jnp.float32)}
    return params, cfg


def _hf_block(sd, prefix):
    wq = _np(sd[prefix + ".self_attn.q_proj.weight"])
    wk = _np(sd[prefix + ".self_attn.k_proj.weight"])
    wv = _np(sd[prefix + ".self_attn.v_proj.weight"])
    bq = _np(sd[prefix + ".self_attn.q_proj.bias"])
    bk = _np(sd[prefix + ".self_attn.k_proj.bias"])
    bv = _np(sd[prefix + ".self_attn.v_proj.bias"])
    return {
        "ln_1": _ln(sd, prefix + ".layer_norm1"),
        "attn": {
            "w_qkv": jnp.asarray(np.concatenate([wq.T, wk.T, wv.T], axis=1)),
            "b_qkv": jnp.asarray(np.concatenate([bq, bk, bv])),
            "w_out": jnp.asarray(_np(sd[prefix + ".self_attn.out_proj.weight"]).T),
            "b_out": jnp.asarray(_np(sd[prefix + ".self_attn.out_proj.bias"])),
        },
        "ln_2": _ln(sd, prefix + ".layer_norm2"),
        "mlp": {
            "w_fc": jnp.asarray(_np(sd[prefix + ".mlp.fc1.weight"]).T),
            "b_fc": jnp.asarray(_np(sd[prefix + ".mlp.fc1.bias"])),
            "w_proj": jnp.asarray(_np(sd[prefix + ".mlp.fc2.weight"]).T),
            "b_proj": jnp.asarray(_np(sd[prefix + ".mlp.fc2.bias"])),
        },
    }


def from_hf_state_dict(sd: Mapping, cfg: CLIPConfig):
    """Convert a HF transformers CLIPModel state dict (quick_gelu checkpoints)."""
    v, t = cfg.vision, cfg.text
    # HF spells it "pre_layrnorm" (sic)
    pre_ln_key = "vision_model.pre_layrnorm" if "vision_model.pre_layrnorm.weight" in sd \
        else "vision_model.pre_layernorm"
    vision = {
        "patch_embed": _conv_to_patch_embed(sd["vision_model.embeddings.patch_embedding.weight"]),
        "class_emb": jnp.asarray(_np(sd["vision_model.embeddings.class_embedding"]).reshape(-1)),
        "pos_emb": jnp.asarray(_np(sd["vision_model.embeddings.position_embedding.weight"])),
        "ln_pre": _ln(sd, pre_ln_key),
        "blocks": _stack([_hf_block(sd, f"vision_model.encoder.layers.{i}")
                          for i in range(v.layers)]),
        "ln_post": _ln(sd, "vision_model.post_layernorm"),
        "proj": jnp.asarray(_np(sd["visual_projection.weight"]).T),
    }
    text = {
        "tok_emb": jnp.asarray(_np(sd["text_model.embeddings.token_embedding.weight"])),
        "pos_emb": jnp.asarray(_np(sd["text_model.embeddings.position_embedding.weight"])),
        "blocks": _stack([_hf_block(sd, f"text_model.encoder.layers.{i}")
                          for i in range(t.layers)]),
        "ln_final": _ln(sd, "text_model.final_layer_norm"),
        "proj": jnp.asarray(_np(sd["text_projection.weight"]).T),
    }
    return {"vision": vision, "text": text,
            "logit_scale": jnp.asarray(float(_np(sd["logit_scale"])), dtype=jnp.float32)}


def load_torch_checkpoint(path: str, *, allow_pickle: bool = False):
    """Load a .pt state dict (OpenAI JIT archive or plain state_dict) as numpy.

    Plain state_dicts load with weights_only=True (no arbitrary pickle execution).
    JIT archives / pickled Modules need full unpickling — that path runs untrusted
    code from the file, so it is gated behind allow_pickle (or CCTPU_UNSAFE_PICKLE=1).
    """
    import os
    import pickle

    import torch

    allow_pickle = allow_pickle or os.environ.get("CCTPU_UNSAFE_PICKLE") == "1"
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    try:
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except (RuntimeError, pickle.UnpicklingError):
        # only unpickling-shaped failures mean "needs full pickle"; IO errors etc.
        # propagate as themselves instead of a misleading unsafe-pickle hint
        if not allow_pickle:
            raise ValueError(
                f"{path} is not a plain state_dict; loading it requires full pickle "
                "execution (arbitrary code from the file). Set CCTPU_UNSAFE_PICKLE=1 "
                "if you trust this checkpoint.")
        obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return {k: _np(v) for k, v in obj.items()}

"""Tensor-parallel sharding rules for the CLIP pytree (GSPMD path).

For ViT-L/14-scale fine-tunes (BASELINE.json config 5) params get Megatron-style
column/row sharding over the "model" mesh axis; everything else (embeddings, LNs,
projections) stays replicated. Under jit with these NamedShardings XLA GSPMD
propagates the layouts and inserts the per-block psum over ICI — no hand-written
collectives in model code.

Layout recap (models/blocks.py, weights [in, out], stacked leading L):
  attn.w_qkv [L, D, 3D]   -> column-parallel: out dim over "model"
  attn.w_out [L, D, D]    -> row-parallel:    in  dim over "model"
  mlp.w_fc   [L, D, 4D]   -> column-parallel
  mlp.w_proj [L, 4D, D]   -> row-parallel
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from construction_clip_tpu.core.mesh import MODEL_AXIS


def _block_specs() -> dict:
    return {
        "ln_1": {"scale": P(), "bias": P()},
        "attn": {
            "w_qkv": P(None, None, MODEL_AXIS),
            "b_qkv": P(None, MODEL_AXIS),
            "w_out": P(None, MODEL_AXIS, None),
            "b_out": P(),
        },
        "ln_2": {"scale": P(), "bias": P()},
        "mlp": {
            "w_fc": P(None, None, MODEL_AXIS),
            "b_fc": P(None, MODEL_AXIS),
            "w_proj": P(None, MODEL_AXIS, None),
            "b_proj": P(),
        },
    }


def clip_param_specs() -> dict:
    """PartitionSpec pytree matching models/clip.init_clip's structure."""
    return {
        "vision": {
            "patch_embed": P(), "class_emb": P(), "pos_emb": P(),
            "ln_pre": {"scale": P(), "bias": P()},
            "blocks": _block_specs(),
            "ln_post": {"scale": P(), "bias": P()},
            "proj": P(),
        },
        "text": {
            "tok_emb": P(), "pos_emb": P(),
            "blocks": _block_specs(),
            "ln_final": {"scale": P(), "bias": P()},
            "proj": P(),
        },
        "logit_scale": P(),
    }


def tree_shardings(mesh: Mesh, spec_tree):
    return jax.tree.map(lambda s: NamedSharding(mesh, s), spec_tree,
                        is_leaf=lambda x: isinstance(x, P))


def shard_clip_params(mesh: Mesh, params):
    """Place CLIP params with TP shardings over `mesh`."""
    shardings = tree_shardings(mesh, clip_param_specs())
    return jax.tree.map(jax.device_put, params, shardings)

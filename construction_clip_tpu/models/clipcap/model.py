"""ClipCap-style prefix captioning: CLIP embedding -> mapper -> GPT-2 prefix.

Reference architecture (reference CLIP_prefix_caption/train.py:110-293):
  - MLP mapper: Linear(512 -> (768*20)/2) -> Tanh -> Linear(-> 768*20), reshaped to
    [B, 20, 768] (train.py:110-123, 409-411).
  - TransformerMapper: Linear(512 -> clip_length*768), concat with a LEARNED prefix
    constant [prefix_length, 768], run 8 pre-norm blocks (8 heads, mlp_ratio 2, ReLU),
    keep the last prefix_length positions (train.py:234-248).
  - ClipCaptionModel.forward: inputs_embeds = concat[prefix_proj, wte(attribute),
    wte(tokens)] -> GPT-2 (train.py:256-268).
  - ClipCaptionPrefix freezes the LM and trains only the mapper (train.py:285-293).
  - Loss: CE over logits[:, prefix_len + attr_len - 1 : -1] vs tokens, ignore_index=0
    (train.py:356-357) — i.e. next-token prediction for the caption tokens only, with
    id-0 ([PAD] in the BERT-chinese vocab) positions masked out.

Freezing is a training-loop concern here (grads taken w.r.t. params["mapper"] only —
see train/caption.py), not a parameter-surgery hack like the reference's overridden
`parameters()` (train.py:287-288).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from construction_clip_tpu.core.configs import ClipCapConfig, GPT2Config
from construction_clip_tpu.core.precision import Policy, DEFAULT_POLICY
from construction_clip_tpu.models import gpt2 as gpt2_lib
from construction_clip_tpu.models.blocks import init_stack, apply_stack


def init_mapper(key, ccfg: ClipCapConfig, gcfg: GPT2Config, dtype=jnp.float32):
    d = gcfg.n_embd
    if ccfg.mapper == "mlp":
        k1, k2 = jax.random.split(key)
        hidden = (d * ccfg.prefix_length) // 2
        out = d * ccfg.prefix_length
        return {
            "w1": (jax.random.normal(k1, (ccfg.clip_dim, hidden)) * (ccfg.clip_dim ** -0.5)).astype(dtype),
            "b1": jnp.zeros((hidden,), dtype),
            "w2": (jax.random.normal(k2, (hidden, out)) * (hidden ** -0.5)).astype(dtype),
            "b2": jnp.zeros((out,), dtype),
        }
    elif ccfg.mapper == "transformer":
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "proj": (jax.random.normal(k1, (ccfg.clip_dim, ccfg.clip_length * d))
                     * (ccfg.clip_dim ** -0.5)).astype(dtype),
            "proj_b": jnp.zeros((ccfg.clip_length * d,), dtype),
            "prefix_const": (jax.random.normal(k2, (ccfg.prefix_length, d)) * 0.02).astype(dtype),
            "blocks": init_stack(k3, ccfg.mapper_layers, d, mlp_ratio=2.0, dtype=dtype),
        }
    raise ValueError(f"unknown mapper {ccfg.mapper!r}")


def map_prefix(mapper_params, ccfg: ClipCapConfig, gcfg: GPT2Config, clip_embed,
               *, policy: Policy = DEFAULT_POLICY):
    """clip_embed [B, clip_dim] -> prefix embeddings [B, prefix_length, n_embd]."""
    p = policy.cast_to_compute(mapper_params)
    x = clip_embed.astype(policy.compute_dtype)
    d = gcfg.n_embd
    if ccfg.mapper == "mlp":
        h = jnp.tanh(x @ p["w1"] + p["b1"])
        out = h @ p["w2"] + p["b2"]
        return out.reshape(x.shape[0], ccfg.prefix_length, d)
    # transformer mapper
    proj = (x @ p["proj"] + p["proj_b"]).reshape(x.shape[0], ccfg.clip_length, d)
    const = jnp.broadcast_to(p["prefix_const"], (x.shape[0], ccfg.prefix_length, d))
    seq = jnp.concatenate([proj, const], axis=1)
    seq = apply_stack(p["blocks"], seq, n_heads=8, act=jax.nn.relu)
    return seq[:, ccfg.clip_length:]


def init_clipcap(key, ccfg: ClipCapConfig, gcfg: GPT2Config, dtype=jnp.float32,
                 gpt_params=None):
    """Full stack params: {"mapper": ..., "gpt": ...}. Pass converted pretrained
    gpt_params to start from ckiplab/gpt2-base-chinese like the reference."""
    k1, k2 = jax.random.split(key)
    return {
        "mapper": init_mapper(k1, ccfg, gcfg, dtype),
        "gpt": gpt_params if gpt_params is not None else gpt2_lib.init_gpt2(k2, gcfg, dtype),
    }


def clipcap_forward(params, ccfg: ClipCapConfig, gcfg: GPT2Config, *,
                    tokens, clip_embed, attribute_tokens,
                    policy: Policy = DEFAULT_POLICY, remat: bool = False):
    """Training forward: logits over the concatenated [prefix‖attribute‖caption]
    sequence — reference ClipCaptionModel.forward (train.py:256-268)."""
    prefix = map_prefix(params["mapper"], ccfg, gcfg, clip_embed, policy=policy)
    attr_emb = gpt2_lib.embed_tokens(params["gpt"], attribute_tokens, policy=policy)
    tok_emb = gpt2_lib.embed_tokens(params["gpt"], tokens, policy=policy)
    embeds = jnp.concatenate([prefix.astype(tok_emb.dtype), attr_emb, tok_emb], axis=1)
    logits, _ = gpt2_lib.gpt2_forward(params["gpt"], gcfg, inputs_embeds=embeds,
                                      policy=policy, remat=remat)
    return logits


def clipcap_forward_pp(params, ccfg: ClipCapConfig, gcfg: GPT2Config, *,
                       tokens, clip_embed, attribute_tokens, mesh,
                       microbatches: int,
                       policy: Policy = DEFAULT_POLICY, remat: bool = False,
                       dp_axis=None):
    """clipcap_forward with the GPT-2 block stack PIPELINED over the mesh's
    "pipe" axis (parallel/pipeline.py): mapper/embeddings/head stay
    replicated jit ops; only [mb, T, D] activations cross stages. Exactly
    clipcap_forward's math — same embed path, same block function, same
    head — so loss/grads match single-device (tests/test_pipeline_parallel)."""
    from construction_clip_tpu.parallel.pipeline import pipelined_blocks

    prefix = map_prefix(params["mapper"], ccfg, gcfg, clip_embed, policy=policy)
    attr_emb = gpt2_lib.embed_tokens(params["gpt"], attribute_tokens, policy=policy)
    tok_emb = gpt2_lib.embed_tokens(params["gpt"], tokens, policy=policy)
    embeds = jnp.concatenate([prefix.astype(tok_emb.dtype), attr_emb, tok_emb], axis=1)

    # gpt2_forward's uncached preamble (models/gpt2.py): cast, add wpe
    p = policy.cast_to_compute(params["gpt"])
    x = embeds.astype(policy.compute_dtype)
    x = x + p["wpe"][jnp.arange(x.shape[1])]
    x = pipelined_blocks(p["blocks"], x, None, gcfg, mesh,
                         microbatches=microbatches, remat=remat,
                         dp_axis=dp_axis)
    x = gpt2_lib.layer_norm(x, **p["ln_f"], eps=gcfg.layer_norm_epsilon)
    return gpt2_lib._lm_logits(p, x)


def caption_loss_parts(logits, tokens, ccfg: ClipCapConfig, *, ignore_id: int = 0):
    """(sum of masked token NLL, valid-token count) — pieces of the global
    token-mean CE, kept separate so DP shards can normalize by the GLOBAL
    count (a pmean of per-shard means diverges from the reference objective
    whenever shards carry different amounts of ignore_id padding)."""
    offset = ccfg.prefix_length + ccfg.attribute_length
    pred = logits[:, offset - 1: -1]  # [B, T_tokens, V]
    logp = jax.nn.log_softmax(pred.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, tokens[..., None], axis=-1)[..., 0]
    mask = (tokens != ignore_id).astype(jnp.float32)
    return jnp.sum(nll * mask), jnp.sum(mask)


def caption_loss(logits, tokens, ccfg: ClipCapConfig, *, ignore_id: int = 0):
    """CE on logits[:, prefix+attr-1 : -1] vs tokens, ignoring ignore_id — the exact
    slice/mask semantics of reference train.py:356-357."""
    total, count = caption_loss_parts(logits, tokens, ccfg, ignore_id=ignore_id)
    return total / jnp.maximum(count, 1.0)

"""T5 caption training step — reference CLIP_prefix_caption/train_t5.py:331-406
semantics (AdamW lr 1e-4, warmup 5000, CE ignore 0 on the prefix-aligned slice),
SPMD data-parallel with optional frozen T5 (ClipCaptionPrefix, train_t5.py:290-298).
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from construction_clip_tpu.core.configs import ClipCapConfig, T5Config
from construction_clip_tpu.core.mesh import DATA_AXIS
from construction_clip_tpu.core.precision import Policy, DEFAULT_POLICY
import jax.numpy as jnp

from construction_clip_tpu.models.clipcap.t5_model import (
    clipcap_t5_forward, t5_caption_loss_parts)
from construction_clip_tpu.train.state import apply_gradients


def make_t5_caption_train_step(ccfg: ClipCapConfig, tcfg: T5Config, tx, mesh: Mesh, *,
                               policy: Policy = DEFAULT_POLICY):
    """(state, frozen_t5_or_None, batch) -> (state, metrics).
    batch: {"input_ids" [B,T] i32, "attention_mask" [B,T] i32, "prefix" [B,clip] f32}.
    only_prefix: state.params = mapper subtree, frozen t5 params ride separately."""
    n_data = mesh.shape[DATA_AXIS]
    only_prefix = ccfg.only_prefix

    def loss_fn(trainable, frozen_t5, batch):
        params = {"mapper": trainable, "t5": frozen_t5} if only_prefix else trainable
        logits = clipcap_t5_forward(params, ccfg, tcfg,
                                    input_ids=batch["input_ids"],
                                    attention_mask=batch["attention_mask"],
                                    clip_embed=batch["prefix"], policy=policy)
        total, count = t5_caption_loss_parts(logits, batch["input_ids"], ccfg)
        if n_data > 1:
            # local numerator / GLOBAL token count (see train/caption.py:
            # pmean of per-shard token-means diverges under uneven padding;
            # psum'ing the numerator in here would double-count grads)
            count = jax.lax.psum(count, DATA_AXIS)
        return total / jnp.maximum(count, 1.0)

    def sharded_step(state, frozen_t5, input_ids, attention_mask, prefix):
        batch = {"input_ids": input_ids, "attention_mask": attention_mask,
                 "prefix": prefix}
        loss, grads = jax.value_and_grad(loss_fn)(state.params, frozen_t5, batch)
        if n_data > 1:
            grads = jax.lax.psum(grads, DATA_AXIS)
            loss = jax.lax.psum(loss, DATA_AXIS)  # global token-mean metric
        return apply_gradients(state, grads, tx), {"loss": loss}

    if n_data > 1:
        sharded_step = shard_map(
            sharded_step, mesh=mesh,
            in_specs=(P(), P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
            out_specs=(P(), P()), check_vma=False)

    @functools.partial(
        jax.jit,
        out_shardings=(NamedSharding(mesh, P()), NamedSharding(mesh, P())),
        donate_argnums=(0,))
    def step(state, frozen_t5, batch):
        return sharded_step(state, frozen_t5, batch["input_ids"],
                            batch["attention_mask"], batch["prefix"])

    return step

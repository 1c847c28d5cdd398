"""ClipCap caption-LM training step: SPMD data-parallel, optional frozen LM.

Reference loop (reference CLIP_prefix_caption/train.py:326-382): AdamW lr 2e-5, warmup
5000, CE on the caption slice, ignore_index 0; ClipCaptionPrefix freezes GPT-2 by
overriding `parameters()` (train.py:287-288). Here freezing is explicit: gradients are
taken w.r.t. the mapper subtree only, and the optimizer state covers exactly the
trainable subtree.
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from construction_clip_tpu.core.configs import ClipCapConfig, GPT2Config
from construction_clip_tpu.core.mesh import DATA_AXIS
from construction_clip_tpu.core.precision import Policy, DEFAULT_POLICY
import jax.numpy as jnp

from construction_clip_tpu.models.clipcap import clipcap_forward
from construction_clip_tpu.models.clipcap.model import caption_loss_parts
from construction_clip_tpu.train.state import TrainState, apply_gradients


def make_caption_train_step(ccfg: ClipCapConfig, gcfg: GPT2Config, tx, mesh: Mesh, *,
                            policy: Policy = DEFAULT_POLICY, remat: bool = False):
    """Returns jitted (state, gpt_params_or_None, batch) -> (state, metrics).

    only_prefix mode (ccfg.only_prefix=True): state.params is the MAPPER subtree and
    the frozen gpt params ride as a separate non-donated argument.
    Full fine-tune: state.params is the whole {"mapper","gpt"} tree, pass None for
    gpt_params.

    batch: {"tokens": [B,T] i32, "prefix": [B,clip_dim] f32, "attribute": [B,A] i32}.
    """
    n_data = mesh.shape[DATA_AXIS]
    only_prefix = ccfg.only_prefix

    def loss_fn(trainable, frozen_gpt, batch):
        params = {"mapper": trainable, "gpt": frozen_gpt} if only_prefix else trainable
        logits = clipcap_forward(params, ccfg, gcfg, tokens=batch["tokens"],
                                 clip_embed=batch["prefix"],
                                 attribute_tokens=batch["attribute"],
                                 policy=policy, remat=remat)
        total, count = caption_loss_parts(logits, batch["tokens"], ccfg)
        if n_data > 1:
            # local numerator / GLOBAL valid-token count: psum(grads) then
            # equals the single-device global-batch gradient for any
            # per-shard padding mix (pmean of per-shard token-means does
            # not). Numerator must NOT be psum'd inside the differentiated
            # function — psum's transpose under shard_map is psum, which
            # double-counts gradients by n_data.
            count = jax.lax.psum(count, DATA_AXIS)
        return total / jnp.maximum(count, 1.0)

    def sharded_step(state: TrainState, frozen_gpt, tokens, prefix, attribute):
        batch = {"tokens": tokens, "prefix": prefix, "attribute": attribute}
        loss, grads = jax.value_and_grad(loss_fn)(state.params, frozen_gpt, batch)
        if n_data > 1:
            grads = jax.lax.psum(grads, DATA_AXIS)
            loss = jax.lax.psum(loss, DATA_AXIS)  # global token-mean metric
        new_state = apply_gradients(state, grads, tx)
        return new_state, {"loss": loss}

    if n_data > 1:
        sharded_step = shard_map(
            sharded_step, mesh=mesh,
            in_specs=(P(), P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
            out_specs=(P(), P()),
            check_vma=False,
        )

    @functools.partial(
        jax.jit,
        out_shardings=(NamedSharding(mesh, P()), NamedSharding(mesh, P())),
        donate_argnums=(0,),
    )
    def step(state, frozen_gpt, batch):
        return sharded_step(state, frozen_gpt,
                            batch["tokens"], batch["prefix"], batch["attribute"])

    return step


def shard_clipcap_params_pp(mesh: Mesh, params):
    """Place a full ClipCap tree for pipeline parallelism: the GPT-2 block
    stack sharded over the "pipe" axis on its leading layer dim (stage s owns
    layers [s*L/S, (s+1)*L/S)); mapper/embeddings/head replicated."""
    from construction_clip_tpu.parallel.pipeline import PIPE_AXIS

    def place(path, x):
        keys = [getattr(p, "key", getattr(p, "name", None)) for p in path]
        spec = P(PIPE_AXIS) if "blocks" in keys else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def make_caption_train_step_pp(ccfg: ClipCapConfig, gcfg: GPT2Config, tx,
                               mesh: Mesh, *, microbatches: int,
                               policy: Policy = DEFAULT_POLICY,
                               remat: bool = False):
    """Pipeline-parallel caption train step (full fine-tune): the GPT-2 block
    stack is stage-sharded over mesh axis "pipe" and driven by the GPipe
    microbatch schedule (parallel/pipeline.py); everything else (mapper,
    embeddings, head, loss, AdamW) runs replicated under GSPMD, composing
    with a "data" axis for PP x DP. Numerically equal to the single-device
    step (tests/test_pipeline_parallel.py).

    state.params must be the FULL {"mapper","gpt"} tree placed by
    shard_clipcap_params_pp(mesh, params) before TrainState.create (opt m/v
    then inherit the stage shardings via zeros_like).
    """
    from construction_clip_tpu.models.clipcap.model import clipcap_forward_pp

    dp_axis = DATA_AXIS if mesh.shape.get(DATA_AXIS, 1) > 1 else None

    def loss_fn(params, batch):
        logits = clipcap_forward_pp(
            params, ccfg, gcfg, tokens=batch["tokens"],
            clip_embed=batch["prefix"], attribute_tokens=batch["attribute"],
            mesh=mesh, microbatches=microbatches, policy=policy, remat=remat,
            dp_axis=dp_axis)
        total, count = caption_loss_parts(logits, batch["tokens"], ccfg)
        # one jit program over the global batch: GSPMD turns these sums into
        # cross-device reductions — the global token-mean objective directly
        return total / jnp.maximum(count, 1.0)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch)
        return apply_gradients(state, grads, tx), {"loss": loss}

    return step

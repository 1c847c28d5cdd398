"""Contrastive fine-tune step: SPMD over the "data" mesh axis, global-batch InfoNCE.

Reference loop: single device, batch -> model(image, text) -> symmetric CE -> AdamW
(reference CLIP/train.py:150-171). Here the whole step is ONE jitted SPMD program via
shard_map: each chip encodes its batch shard, features are all-gathered over ICI
(parallel/infonce.py), per-chip grads are pmean'd, and the optimizer update runs
replicated. Params live replicated (ViT-B fits easily per-chip); scaling is pure DP.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from construction_clip_tpu.core.configs import CLIPConfig
from construction_clip_tpu.core.mesh import DATA_AXIS
from construction_clip_tpu.core.precision import Policy, DEFAULT_POLICY
from construction_clip_tpu.models.clip import encode_image, encode_text
from construction_clip_tpu.parallel.infonce import global_infonce, local_infonce
from construction_clip_tpu.train.state import TrainState, apply_gradients


def make_train_step(cfg: CLIPConfig, tx, mesh: Mesh, *,
                    policy: Policy = DEFAULT_POLICY, remat: bool = False):
    """Returns jitted (state, batch) -> (state, metrics).

    batch: {"images": [B,H,W,3] f32, "tokens": [B,ctx] i32}, B divisible by the
    data-axis size; leading dim sharded over "data".
    """
    n_data = mesh.shape[DATA_AXIS]

    def loss_fn(params, images, tokens):
        img_f = encode_image(params, cfg, images, policy=policy, normalize=True,
                             remat=remat)
        txt_f = encode_text(params, cfg, tokens, policy=policy, normalize=True)
        if n_data > 1:
            loss, acc = global_infonce(img_f, txt_f, params["logit_scale"])
        else:
            loss, logits = local_infonce(img_f, txt_f, params["logit_scale"])
            labels = jnp.arange(logits.shape[0])
            acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        return loss, acc

    def sharded_step(state: TrainState, images, tokens):
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, images, tokens)
        if n_data > 1:
            grads = jax.lax.pmean(grads, DATA_AXIS)
            loss = jax.lax.pmean(loss, DATA_AXIS)
            acc = jax.lax.pmean(acc, DATA_AXIS)
        new_state = apply_gradients(state, grads, tx)
        return new_state, {"loss": loss, "accuracy": acc,
                           "logit_scale": new_state.params["logit_scale"]}

    if n_data > 1:
        sharded_step = shard_map(
            sharded_step, mesh=mesh,
            in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS)),
            out_specs=(P(), P()),
            check_vma=False,
        )

    @functools.partial(
        jax.jit,
        out_shardings=(NamedSharding(mesh, P()), NamedSharding(mesh, P())),
        donate_argnums=(0,),
    )
    def step(state, batch):
        return sharded_step(state, batch["images"], batch["tokens"])

    return step


def make_gspmd_train_step(cfg: CLIPConfig, tx, mesh: Mesh, *,
                          policy: Policy = DEFAULT_POLICY, remat: bool = False):
    """TP x DP contrastive step via GSPMD auto-sharding (the ViT-L/14 large-model
    path, BASELINE.json config 5): params carry Megatron column/row shardings over
    the "model" axis (parallel/sharding.py), the batch is sharded over "data", and
    the loss is written as plain global-batch math — XLA inserts every collective
    (per-block psum for TP, logit-matrix all-gathers for DP) over ICI.

    Returns (step, state_shardings): place state leaves with state_shardings
    (TrainState.create on TP-sharded params already yields them)."""
    def loss_fn(params, images, tokens):
        img_f = encode_image(params, cfg, images, policy=policy, normalize=True,
                             remat=remat)
        txt_f = encode_text(params, cfg, tokens, policy=policy, normalize=True)
        loss, logits = local_infonce(img_f, txt_f, params["logit_scale"])
        labels = jnp.arange(logits.shape[0])
        acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        return loss, acc

    batch_sh = NamedSharding(mesh, P(DATA_AXIS))

    @functools.partial(
        jax.jit,
        in_shardings=(None, {"images": batch_sh, "tokens": batch_sh}),
        donate_argnums=(0,),
    )
    def step(state: TrainState, batch):
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch["images"], batch["tokens"])
        new_state = apply_gradients(state, grads, tx)
        return new_state, {"loss": loss, "accuracy": acc}

    return step


def make_eval_step(cfg: CLIPConfig, mesh: Mesh, *, policy: Policy = DEFAULT_POLICY):
    """Batch accuracy eval, matching the reference's test loop metric
    (reference CLIP/train.py:189-207)."""

    def eval_fn(params, images, tokens):
        img_f = encode_image(params, cfg, images, policy=policy, normalize=True)
        txt_f = encode_text(params, cfg, tokens, policy=policy, normalize=True)
        _, logits = local_infonce(img_f, txt_f, params["logit_scale"])
        labels = jnp.arange(logits.shape[0])
        return jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))

    return jax.jit(lambda params, batch: eval_fn(params, batch["images"], batch["tokens"]))

"""Train state + optimizer factories.

Reference optimization: AdamW lr 1e-5 with `get_linear_schedule_with_warmup`
(warmup 5000) for CLIP fine-tune (reference CLIP/train.py:127,143-148), AdamW lr 2e-5 /
warmup 5000 for ClipCap (reference CLIP_prefix_caption/train.py:336-340).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any

    @staticmethod
    def create(params, tx: optax.GradientTransformation) -> "TrainState":
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          opt_state=tx.init(params))


def apply_gradients(state: TrainState, grads, tx: optax.GradientTransformation) -> TrainState:
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    return TrainState(step=state.step + 1,
                      params=optax.apply_updates(state.params, updates),
                      opt_state=new_opt)


def linear_warmup_schedule(lr: float, warmup_steps: int, total_steps: int) -> optax.Schedule:
    """HF get_linear_schedule_with_warmup semantics: linear 0->lr over warmup, then
    linear decay lr->0 over the remainder."""
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, warmup_steps)
        decay = jnp.maximum(0.0, (total_steps - step) /
                            jnp.maximum(1.0, total_steps - warmup_steps))
        return lr * jnp.where(step < warmup_steps, warm, decay)
    return schedule


def make_adamw(lr: float = 1e-5, *, warmup_steps: int = 5000,
               total_steps: int = 100_000, weight_decay: float = 0.0,
               b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
               grad_clip: float | None = None) -> optax.GradientTransformation:
    sched = linear_warmup_schedule(lr, warmup_steps, total_steps)
    parts = []
    if grad_clip is not None:
        parts.append(optax.clip_by_global_norm(grad_clip))
    parts.append(optax.adamw(sched, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay))
    return optax.chain(*parts)

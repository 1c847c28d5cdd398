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
        """params may be mesh-placed (replicate/shard_clip_params). Scalars
        created here (step, optimizer count) are then committed REPLICATED over
        the same mesh: m/v inherit the params' shardings via zeros_like, but a
        bare jnp scalar is uncommitted and an orbax restore would pin it to one
        device — making the restored state unusable against mesh-committed
        params (incompatible-devices at the next jitted step)."""
        step = jnp.zeros((), jnp.int32)
        opt_state = tx.init(params)
        named = [l.sharding for l in jax.tree.leaves(params)
                 if isinstance(l, jax.Array)
                 and isinstance(l.sharding, jax.sharding.NamedSharding)]
        if named:
            rep = jax.sharding.NamedSharding(named[0].mesh,
                                             jax.sharding.PartitionSpec())
            place = lambda x: (jax.device_put(x, rep)
                               if isinstance(x, jax.Array) and x.ndim == 0 else x)
            step = place(step)
            opt_state = jax.tree.map(place, opt_state)
        return TrainState(step=step, params=params, opt_state=opt_state)


def apply_gradients(state: TrainState, grads, tx: optax.GradientTransformation) -> TrainState:
    if hasattr(tx, "update_and_apply"):
        # fused path: p - lr*u folds into the same per-leaf traversal as the
        # m/v updates — no updates tree, no optax.apply_updates second pass
        new_params, new_opt = tx.update_and_apply(grads, state.opt_state,
                                                  state.params)
        return TrainState(step=state.step + 1, params=new_params,
                          opt_state=new_opt)
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


@dataclasses.dataclass(frozen=True)
class FusedOptimizer:
    """Duck-types optax.GradientTransformation (init/update with standard
    updates-tree semantics) plus `update_and_apply`, which returns
    (new_params, new_opt_state) with p - lr*u folded into the same per-leaf
    traversal as the m/v updates — one HBM pass per leaf instead of the extra
    read(params,updates)+write(params) that optax.apply_updates costs
    (measured 1.43x the optimizer's HBM roofline, BASELINE.md)."""

    init: Any
    update: Any
    update_and_apply: Any


def fused_adamw(schedule, *, b1: float = 0.9, b2: float = 0.999,
                eps: float = 1e-8, weight_decay: float = 0.0) -> FusedOptimizer:
    """AdamW with the whole per-leaf update in ONE traversal — numerically
    optax.adamw(schedule) (bias correction with count+1, decay added before lr
    scaling, lr taken at the pre-increment count like optax.scale_by_schedule)
    but expressed so XLA fuses read(g,p,m,v) -> write(m,v,delta) into a single
    HBM pass per leaf. optax's chain (scale_by_adam -> add_decayed_weights ->
    scale_by_learning_rate) materializes the updates tree between transforms;
    measured on v5e this update ran 1.5x over its HBM roofline (BASELINE.md
    train-step attribution — the round-2 verdict's item 5)."""

    def init(params):
        z = lambda p: jnp.zeros_like(p)
        return {"count": jnp.zeros((), jnp.int32),
                "m": jax.tree.map(z, params), "v": jax.tree.map(z, params)}

    def _run(grads, state, params, apply: bool):
        count = state["count"]
        c1 = (count + 1).astype(jnp.float32)
        bc1 = 1.0 - b1 ** c1
        bc2 = 1.0 - b2 ** c1
        lr_t = schedule(count)

        def leaf(g, p, m, v):
            m2 = b1 * m + (1.0 - b1) * g
            v2 = b2 * v + (1.0 - b2) * (g * g)
            u = (m2 / bc1) / (jnp.sqrt(v2 / bc2) + eps)
            if weight_decay:
                u = u + weight_decay * p
            return (p - lr_t * u) if apply else (-lr_t * u), m2, v2

        out = jax.tree.map(leaf, grads, params, state["m"], state["v"])
        # unzip the 3-tuples in one pass
        first = jax.tree.map(lambda t: t[0], out,
                             is_leaf=lambda t: isinstance(t, tuple))
        new_m = jax.tree.map(lambda t: t[1], out,
                             is_leaf=lambda t: isinstance(t, tuple))
        new_v = jax.tree.map(lambda t: t[2], out,
                             is_leaf=lambda t: isinstance(t, tuple))
        return first, {"count": count + 1, "m": new_m, "v": new_v}

    def update(grads, state, params=None):
        return _run(grads, state, params, apply=False)

    def update_and_apply(grads, state, params):
        return _run(grads, state, params, apply=True)

    return FusedOptimizer(init, update, update_and_apply)


def make_adamw(lr: float = 1e-5, *, warmup_steps: int = 5000,
               total_steps: int = 100_000, weight_decay: float = 0.0,
               b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
               grad_clip: float | None = None,
               fused: bool = True) -> optax.GradientTransformation:
    sched = linear_warmup_schedule(lr, warmup_steps, total_steps)
    if fused and grad_clip is None:
        # FusedOptimizer exposes update_and_apply (single-traversal p update);
        # chain() would discard it, so only taken when no clip stage precedes
        return fused_adamw(sched, b1=b1, b2=b2, eps=eps,
                           weight_decay=weight_decay)
    parts = []
    if grad_clip is not None:
        parts.append(optax.clip_by_global_norm(grad_clip))
    if fused:
        parts.append(fused_adamw(sched, b1=b1, b2=b2, eps=eps,
                                 weight_decay=weight_decay))
    else:
        parts.append(optax.adamw(sched, b1=b1, b2=b2, eps=eps,
                                 weight_decay=weight_decay))
    return optax.chain(*parts)

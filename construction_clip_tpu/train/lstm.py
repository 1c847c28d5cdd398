"""Show-attend-tell (LSTM captioner) training step: SPMD data-parallel.

The reference trainer is single-GPU (reference attention_model/train.py:137-163:
CE on captions[:,1:], Adam lr 3e-4, dropout 0.3 on the decoder hidden state).
Here the step is DP over the feature batch like every other trainer in this
package. The loss is the GLOBAL token mean: each shard contributes
(sum of masked NLL, valid-token count) and both are psum'd before dividing —
a pmean of per-shard means would diverge from the single-device objective
whenever shards carry different amounts of caption padding. Grads are scaled
by the same global count, so the update equals the single-device update on
the global batch for ANY padding distribution.

Dropout note: the reference draws ONE dropout mask stream per step. Under DP
each shard folds the step key with its data-axis index, which is a valid (but
not bitwise-1-device-reproducible) sampling of the same distribution; passing
dropout_rate=0.0 makes the sharded loss exactly equal single-device, which is
what `__graft_entry__.dryrun_multichip` certifies.
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from construction_clip_tpu.core.mesh import DATA_AXIS
import jax.numpy as jnp

from construction_clip_tpu.models.lstm_captioner import (captioner_forward,
                                                         caption_lm_loss_parts)
from construction_clip_tpu.train.state import TrainState, apply_gradients


def make_lstm_train_step(tx, mesh: Mesh, *, dropout_rate: float = 0.3):
    """Returns jitted (state, batch, rng) -> (state, metrics).

    batch: {"features": [B,49,2048] f32 frozen-CNN grid, "tokens": [B,T] i32}.
    """
    n_data = mesh.shape[DATA_AXIS]

    def loss_fn(params, features, tokens, rng):
        logits, _ = captioner_forward(params, features, tokens,
                                      dropout_rate=dropout_rate, rng=rng)
        total, count = caption_lm_loss_parts(logits, tokens)
        if n_data > 1:
            # LOCAL numerator over GLOBAL denominator: each shard's loss is
            # its contribution to the global token mean, so psum(grads) is
            # exactly the single-device global-batch gradient for any
            # per-shard padding mix. Do NOT psum the numerator inside the
            # differentiated function — psum's transpose under shard_map is
            # psum, which double-counts the gradient by n_data (measured
            # ratio exactly 2.0 on a 2-way mesh).
            count = jax.lax.psum(count, DATA_AXIS)
        return total / jnp.maximum(count, 1.0)

    def sharded_step(state: TrainState, features, tokens, rng):
        if n_data > 1 and dropout_rate > 0.0:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))
        loss, grads = jax.value_and_grad(loss_fn)(state.params, features,
                                                  tokens, rng)
        if n_data > 1:
            grads = jax.lax.psum(grads, DATA_AXIS)
            loss = jax.lax.psum(loss, DATA_AXIS)  # global token-mean metric
        return apply_gradients(state, grads, tx), {"loss": loss}

    if n_data > 1:
        sharded_step = shard_map(
            sharded_step, mesh=mesh,
            in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )

    @functools.partial(
        jax.jit,
        out_shardings=(NamedSharding(mesh, P()), NamedSharding(mesh, P())),
        donate_argnums=(0,),
    )
    def step(state, batch, rng):
        return sharded_step(state, batch["features"], batch["tokens"], rng)

    return step

"""Show-attend-tell (LSTM captioner) training step: SPMD data-parallel.

The reference trainer is single-GPU (reference attention_model/train.py:137-163:
CE on captions[:,1:], Adam lr 3e-4, dropout 0.3 on the decoder hidden state).
Here the step is DP over the feature batch like every other trainer in this
package: per-shard grads are pmean'd over the data axis, so the update equals
the single-device update on the global batch.

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
from construction_clip_tpu.models.lstm_captioner import (captioner_forward,
                                                         caption_lm_loss)
from construction_clip_tpu.train.state import TrainState, apply_gradients


def make_lstm_train_step(tx, mesh: Mesh, *, dropout_rate: float = 0.3):
    """Returns jitted (state, batch, rng) -> (state, metrics).

    batch: {"features": [B,49,2048] f32 frozen-CNN grid, "tokens": [B,T] i32}.
    """
    n_data = mesh.shape[DATA_AXIS]

    def loss_fn(params, features, tokens, rng):
        logits, _ = captioner_forward(params, features, tokens,
                                      dropout_rate=dropout_rate, rng=rng)
        return caption_lm_loss(logits, tokens)

    def sharded_step(state: TrainState, features, tokens, rng):
        if n_data > 1 and dropout_rate > 0.0:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))
        loss, grads = jax.value_and_grad(loss_fn)(state.params, features,
                                                  tokens, rng)
        if n_data > 1:
            grads = jax.lax.pmean(grads, DATA_AXIS)
            loss = jax.lax.pmean(loss, DATA_AXIS)
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

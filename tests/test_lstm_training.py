"""DP training step for the show-attend-tell LSTM captioner (train/lstm.py):
sharded loss equals single-device, loss decreases, dropout path runs.

The reference trainer is single-GPU (reference attention_model/train.py:137-163);
the DP step is this framework's scaling upgrade, certified alongside the other
four trainers in __graft_entry__.dryrun_multichip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from construction_clip_tpu.core.mesh import (create_mesh, DATA_AXIS, MODEL_AXIS,
                                             shard_batch, replicate)
from construction_clip_tpu.models.lstm_captioner import init_lstm_captioner
from construction_clip_tpu.train.lstm import make_lstm_train_step
from construction_clip_tpu.train.state import TrainState


def _setup(b=8):
    params = init_lstm_captioner(
        jax.random.key(0), vocab_size=40, embed_size=12, attention_dim=8,
        encoder_dim=10, decoder_dim=12)
    rng = np.random.default_rng(1)
    batch = {
        "features": jnp.asarray(rng.standard_normal((b, 9, 10)), jnp.float32),
        "tokens": jnp.asarray(rng.integers(1, 40, (b, 6)), jnp.int32),
    }
    return params, batch


def test_dp_loss_equals_single_device():
    params, batch = _setup()
    tx = optax.adam(1e-3)
    losses = {}
    for n in (1, 4):
        mesh = create_mesh({DATA_AXIS: n, MODEL_AXIS: 1},
                           devices=jax.devices()[:n])
        step = make_lstm_train_step(tx, mesh, dropout_rate=0.0)
        st = TrainState.create(replicate(mesh, jax.tree.map(jnp.copy, params)), tx)
        st, m = step(st, shard_batch(mesh, batch), jax.random.key(2))
        assert int(st.step) == 1
        losses[n] = float(m["loss"])
    np.testing.assert_allclose(losses[1], losses[4], rtol=1e-5)


def test_loss_decreases_with_dropout():
    params, batch = _setup()
    tx = optax.adam(5e-3)
    mesh = create_mesh({DATA_AXIS: 2, MODEL_AXIS: 1}, devices=jax.devices()[:2])
    step = make_lstm_train_step(tx, mesh, dropout_rate=0.3)
    st = TrainState.create(replicate(mesh, params), tx)
    key = jax.random.key(3)
    first = None
    for i in range(8):
        key, sub = jax.random.split(key)
        st, m = step(st, shard_batch(mesh, batch), sub)
        if first is None:
            first = float(m["loss"])
    assert float(m["loss"]) < first


def test_dp_loss_equals_single_device_uneven_padding():
    """Shards with different valid-token counts: the global-token-mean loss
    (psum of sums, not pmean of means) must still equal single-device, and so
    must the parameter update."""
    params, batch = _setup()
    # rows 0-3 mostly padding, rows 4-7 full — shard 0 and shard 1 of a 2-way
    # mesh see very different token counts
    toks = np.array(batch["tokens"])  # writable copy
    toks[:4, 2:] = 0
    batch = dict(batch, tokens=jnp.asarray(toks))
    # SGD: the update is LINEAR in the grads, so single-vs-multi-device param
    # equality is well-conditioned (Adam's m/sqrt(v) after one step is
    # sign(g)-like and amplifies fp32 psum reordering noise on ~0 grads)
    tx = optax.sgd(0.1)
    states = {}
    for n in (1, 2, 4):
        mesh = create_mesh({DATA_AXIS: n, MODEL_AXIS: 1},
                           devices=jax.devices()[:n])
        step = make_lstm_train_step(tx, mesh, dropout_rate=0.0)
        st = TrainState.create(replicate(mesh, jax.tree.map(jnp.copy, params)), tx)
        st, m = step(st, shard_batch(mesh, batch), jax.random.key(2))
        states[n] = (float(m["loss"]), st.params)
    for n in (2, 4):
        np.testing.assert_allclose(states[1][0], states[n][0], rtol=1e-5)
        for a, b in zip(jax.tree.leaves(states[1][1]),
                        jax.tree.leaves(states[n][1])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6, rtol=1e-5)

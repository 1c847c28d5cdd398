"""Global-batch InfoNCE over an 8-device mesh must equal single-device full-batch
training — loss, accuracy, and the resulting parameter update."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from construction_clip_tpu.core.configs import CLIPConfig
from construction_clip_tpu.core.mesh import create_mesh, DATA_AXIS, MODEL_AXIS
from construction_clip_tpu.models.clip import init_clip
from construction_clip_tpu.train.contrastive import make_train_step, make_eval_step
from construction_clip_tpu.train.state import TrainState, make_adamw


@pytest.fixture(scope="module")
def setup():
    cfg = CLIPConfig.tiny()
    params = init_clip(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    B = 16
    batch = {
        "images": jnp.asarray(rng.standard_normal((B, 32, 32, 3)), dtype=jnp.float32),
        "tokens": jnp.asarray(
            np.concatenate([
                np.full((B, 1), 254), rng.integers(3, 200, (B, 6)),
                np.full((B, 1), 255), np.zeros((B, 8))], axis=1).astype(np.int32)),
    }
    return cfg, params, batch


def test_eight_device_matches_single(setup):
    cfg, params, batch = setup
    assert jax.device_count() == 8, "conftest must provide 8 virtual CPU devices"
    # plain SGD so the param delta IS the gradient — Adam would amplify fp-noise-level
    # grad differences into full ±lr sign flips on near-zero-grad elements.
    import optax

    tx = optax.sgd(1.0)

    import jax.numpy as jnp

    fresh = lambda: jax.tree.map(jnp.copy, params)  # train steps donate their state
    mesh1 = create_mesh({DATA_AXIS: 1, MODEL_AXIS: 1}, devices=jax.devices()[:1])
    step1 = make_train_step(cfg, tx, mesh1)
    s1 = TrainState.create(jax.device_put(fresh(), jax.devices()[0]), tx)
    s1, m1 = step1(s1, batch)

    mesh8 = create_mesh({DATA_AXIS: 8, MODEL_AXIS: 1})
    from construction_clip_tpu.core.mesh import shard_batch, replicate

    step8 = make_train_step(cfg, tx, mesh8)
    s8 = TrainState.create(replicate(mesh8, fresh()), tx)
    s8, m8 = step8(s8, shard_batch(mesh8, batch))

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m1["accuracy"]), float(m8["accuracy"]), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)


def test_loss_decreases(setup):
    cfg, params, batch = setup
    tx = make_adamw(1e-3, warmup_steps=0, total_steps=1000)
    mesh = create_mesh({DATA_AXIS: 8, MODEL_AXIS: 1})
    from construction_clip_tpu.core.mesh import shard_batch, replicate

    step = make_train_step(cfg, tx, mesh)
    state = TrainState.create(replicate(mesh, jax.tree.map(jnp.copy, params)), tx)
    b = shard_batch(mesh, batch)
    losses = []
    for _ in range(5):
        state, m = step(state, b)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses


def test_eval_step(setup):
    cfg, params, batch = setup
    mesh = create_mesh({DATA_AXIS: 1, MODEL_AXIS: 1}, devices=jax.devices()[:1])
    ev = make_eval_step(cfg, mesh)
    acc = ev(params, batch)
    assert 0.0 <= float(acc) <= 1.0

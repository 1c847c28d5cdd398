"""Failure detection + elastic recovery + determinism."""

import time

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from construction_clip_tpu.train.resilience import (
    StepWatchdog, run_resilient, deterministic)
from construction_clip_tpu.train.state import TrainState


def test_watchdog_detects_stall():
    stalls = []
    with StepWatchdog(timeout=0.2, poll=0.05,
                      on_stall=lambda dt: stalls.append(dt)) as wd:
        for _ in range(3):
            wd.tick()
            time.sleep(0.05)
        assert not stalls
        time.sleep(0.5)  # no ticks -> stall fires once
    assert len(stalls) == 1
    assert wd.stall_count == 1


def test_watchdog_refires_after_recovery():
    stalls = []
    with StepWatchdog(timeout=0.15, poll=0.03,
                      on_stall=lambda dt: stalls.append(dt)) as wd:
        time.sleep(0.3)
        wd.tick()  # recover
        time.sleep(0.3)
    assert len(stalls) == 2


def test_run_resilient_retries_and_resumes(tmp_path):
    tx = optax.sgd(0.1)
    params = {"w": jnp.ones((4,))}
    state = TrainState.create(params, tx)
    calls = {"n": 0}

    def epoch_fn(state, epoch):
        calls["n"] += 1
        if epoch == 2 and calls["n"] <= 4:  # fail twice at epoch 2 (calls 3 and 4)
            raise RuntimeError("injected device failure")
        grads = {"w": jnp.ones((4,))}
        from construction_clip_tpu.train.state import apply_gradients

        return apply_gradients(state, grads, tx)

    final = run_resilient(epoch_fn, state, epochs=4,
                          checkpoint_dir=str(tmp_path / "ck"), max_retries=3)
    # 4 successful epochs -> w = 1 - 0.1*4
    np.testing.assert_allclose(np.asarray(final.params["w"]),
                               np.full(4, 1.0 - 0.4), rtol=1e-6)
    assert calls["n"] >= 6  # 4 successes + 2 failures


def test_run_resilient_gives_up(tmp_path):
    tx = optax.sgd(0.1)
    state = TrainState.create({"w": jnp.ones(2)}, tx)

    def always_fail(state, epoch):
        raise RuntimeError("hard failure")

    with pytest.raises(RuntimeError, match="hard failure"):
        run_resilient(always_fail, state, epochs=2,
                      checkpoint_dir=str(tmp_path / "ck"), max_retries=1)


def test_run_resilient_cold_resume(tmp_path):
    """A fresh process (new state object) resumes from the on-disk checkpoint."""
    tx = optax.sgd(0.1)
    ckpt = str(tmp_path / "ck")

    def epoch_fn(state, epoch):
        from construction_clip_tpu.train.state import apply_gradients

        return apply_gradients(state, {"w": jnp.ones(2)}, tx)

    s1 = run_resilient(epoch_fn, TrainState.create({"w": jnp.ones(2)}, tx),
                       epochs=2, checkpoint_dir=ckpt)
    # "restart": same dir, fresh initial state, more epochs
    s2 = run_resilient(epoch_fn, TrainState.create({"w": jnp.ones(2)}, tx),
                       epochs=4, checkpoint_dir=ckpt)
    np.testing.assert_allclose(np.asarray(s2.params["w"]), np.full(2, 1.0 - 0.4),
                               rtol=1e-6)


def test_deterministic_training():
    """Same seed -> bit-identical params after training (the reference's
    seed-567 + cudnn-deterministic discipline, reference CLIP/train.py:28-34)."""
    from construction_clip_tpu.core.configs import CLIPConfig
    from construction_clip_tpu.models.clip import init_clip, clip_forward

    def run():
        key = deterministic(567)
        cfg = CLIPConfig.tiny()
        params = init_clip(key, cfg)
        tx = optax.adam(1e-3)
        opt = tx.init(params)
        imgs = jax.random.normal(jax.random.key(1), (4, 32, 32, 3))
        toks = jnp.full((4, 16), 3, jnp.int32).at[:, 0].set(255)

        def loss_fn(p):
            li, _ = clip_forward(p, cfg, imgs, toks)
            return -jnp.mean(jnp.diagonal(jax.nn.log_softmax(li)))

        for _ in range(2):
            g = jax.grad(loss_fn)(params)
            up, opt = tx.update(g, opt, params)
            params = optax.apply_updates(params, up)
        return params

    a, b = run(), run()
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

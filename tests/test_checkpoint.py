"""Checkpoint/resume round trip: TrainState through orbax, params through npz."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from construction_clip_tpu.core.configs import CLIPConfig
from construction_clip_tpu.models.clip import init_clip
from construction_clip_tpu.train.state import TrainState
from construction_clip_tpu.train.checkpoint import (
    save_state, restore_state, latest_step, save_params_npz, load_params_npz)


def test_orbax_roundtrip(tmp_path):
    cfg = CLIPConfig.tiny()
    params = init_clip(jax.random.key(0), cfg)
    tx = optax.adam(1e-3)
    state = TrainState.create(params, tx)
    state = TrainState(step=jnp.asarray(7, jnp.int32), params=state.params,
                       opt_state=state.opt_state)

    d = str(tmp_path / "ckpt")
    step = save_state(d, state)
    assert step == 7
    assert latest_step(d) == 7

    template = jax.tree.map(np.zeros_like, state)
    restored = restore_state(d, template)
    assert int(restored.step) == 7
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(state.opt_state), jax.tree.leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_npz_roundtrip(tmp_path):
    cfg = CLIPConfig.tiny()
    params = init_clip(jax.random.key(1), cfg)
    p = str(tmp_path / "params.npz")
    save_params_npz(p, params)
    loaded = load_params_npz(p, params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_metrics_logger(tmp_path):
    from construction_clip_tpu.train.metrics import MetricLogger, StepTimer

    ml = MetricLogger(str(tmp_path), "test")
    ml.log(1, loss=0.5, accuracy=0.9)
    ml.log(2, loss=0.4)
    ml.close()
    import json

    lines = [json.loads(l) for l in open(ml.jsonl_path)]
    assert lines[0]["loss"] == 0.5 and lines[1]["step"] == 2

    t = StepTimer()
    assert t.tick() is None
    assert t.tick() is not None
    assert t.mean > 0

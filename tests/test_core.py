"""core/ unit coverage: mesh construction (axis inference, errors), config JSON
round trip, precision policy casting."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from construction_clip_tpu.core.mesh import (
    create_mesh, local_mesh, shard_batch, replicate, DATA_AXIS, MODEL_AXIS)
from construction_clip_tpu.core.configs import (
    CLIPConfig, GPT2Config, T5Config, ClipCapConfig, to_json, from_json)
from construction_clip_tpu.core.precision import BF16_POLICY, policy_from_name


def test_mesh_inference():
    m = create_mesh({DATA_AXIS: -1, MODEL_AXIS: 2})
    assert m.shape[DATA_AXIS] == 4 and m.shape[MODEL_AXIS] == 2

    with pytest.raises(ValueError, match="not divisible"):
        create_mesh({DATA_AXIS: -1, MODEL_AXIS: 3})
    with pytest.raises(ValueError, match="at most one"):
        create_mesh({DATA_AXIS: -1, MODEL_AXIS: -1})
    with pytest.raises(ValueError):
        create_mesh({DATA_AXIS: 5, MODEL_AXIS: 1})

    assert local_mesh().devices.size == 1


def test_shard_and_replicate():
    m = create_mesh({DATA_AXIS: 8, MODEL_AXIS: 1})
    x = jnp.arange(16.0).reshape(16, 1)
    sharded = shard_batch(m, {"x": x})["x"]
    assert len(sharded.sharding.device_set) == 8
    rep = replicate(m, x)
    np.testing.assert_array_equal(np.asarray(rep), np.asarray(x))


def test_config_json_roundtrip():
    for cfg in (CLIPConfig.vit_l_14(), GPT2Config(), T5Config.tiny(),
                ClipCapConfig(prefix_length=7)):
        s = to_json(cfg)
        back = from_json(type(cfg), s)
        assert back == cfg


def test_policy():
    assert policy_from_name("bf16") is BF16_POLICY
    tree = {"w": jnp.ones((2,), jnp.float32), "i": jnp.ones((2,), jnp.int32)}
    out = BF16_POLICY.cast_to_compute(tree)
    assert out["w"].dtype == jnp.bfloat16
    assert out["i"].dtype == jnp.int32  # non-float leaves untouched
    with pytest.raises(KeyError):
        policy_from_name("fp64")


def test_policy_auto_tracks_backend():
    # tests force the CPU backend (conftest), so auto == fp32 here; on TPU it
    # is BF16_POLICY (the only chip-validated beam-decode config — see
    # core/precision.policy_from_name)
    from construction_clip_tpu.core.precision import DEFAULT_POLICY
    assert policy_from_name("auto") is DEFAULT_POLICY

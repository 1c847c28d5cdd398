"""Tensor-parallel (GSPMD) path: TP x DP sharded training must match single-device
numerics, and params must actually be distributed over the model axis."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from construction_clip_tpu.core.configs import CLIPConfig, VisionConfig, TextConfig
from construction_clip_tpu.core.mesh import (
    create_mesh, DATA_AXIS, MODEL_AXIS, shard_batch)
from construction_clip_tpu.models.clip import init_clip, clip_forward
from construction_clip_tpu.parallel.sharding import shard_clip_params, clip_param_specs
from construction_clip_tpu.train.contrastive import make_gspmd_train_step
from construction_clip_tpu.train.state import TrainState

CFG = CLIPConfig(
    vision=VisionConfig(image_size=16, patch_size=4, width=32, layers=2, heads=2, embed_dim=16),
    text=TextConfig(vocab_size=64, context_length=8, width=32, layers=2, heads=2, embed_dim=16),
)


@pytest.fixture(scope="module")
def batch(rng=np.random.default_rng(5)):
    B = 8
    toks = np.zeros((B, 8), np.int32)
    toks[:, 0] = 62
    toks[:, 1] = 63
    return {
        "images": jnp.asarray(rng.standard_normal((B, 16, 16, 3)), dtype=jnp.float32),
        "tokens": jnp.asarray(toks),
    }


def test_param_specs_cover_tree():
    params = init_clip(jax.random.key(0), CFG)
    specs = clip_param_specs()
    # identical tree structure
    assert jax.tree.structure(params) == jax.tree.structure(
        specs, is_leaf=lambda x: isinstance(x, P))


def test_tp_forward_matches_single_device(batch):
    params = init_clip(jax.random.key(0), CFG)
    ref_i, ref_t = clip_forward(params, CFG, batch["images"], batch["tokens"])

    mesh = create_mesh({DATA_AXIS: 2, MODEL_AXIS: 4})
    tp_params = shard_clip_params(mesh, params)
    # params are actually distributed: w_qkv sharded over model axis
    sh = tp_params["vision"]["blocks"]["attn"]["w_qkv"].sharding
    assert sh.spec == P(None, None, MODEL_AXIS)
    out_i, out_t = jax.jit(lambda p, i, t: clip_forward(p, CFG, i, t))(
        tp_params, *shard_batch(mesh, (batch["images"], batch["tokens"])))
    np.testing.assert_allclose(np.asarray(out_i), np.asarray(ref_i), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(ref_t), rtol=2e-4, atol=2e-5)


def test_tp_dp_train_step_matches_single_device(batch):
    params = init_clip(jax.random.key(0), CFG)
    tx = optax.sgd(1.0)  # param delta == gradient

    # single device
    mesh1 = create_mesh({DATA_AXIS: 1, MODEL_AXIS: 1}, devices=jax.devices()[:1])
    step1 = make_gspmd_train_step(CFG, tx, mesh1)
    s1 = TrainState.create(jax.tree.map(jnp.copy, params), tx)
    s1, m1 = step1(s1, jax.tree.map(lambda x: jax.device_put(x, jax.devices()[0]), batch))

    # TP(4) x DP(2)
    mesh = create_mesh({DATA_AXIS: 2, MODEL_AXIS: 4})
    step = make_gspmd_train_step(CFG, tx, mesh)
    s8 = TrainState.create(shard_clip_params(mesh, jax.tree.map(jnp.copy, params)), tx)
    s8, m8 = step(s8, shard_batch(mesh, batch))

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)

    # second step keeps shardings (donated state round-trips)
    s8, m8 = step(s8, shard_batch(mesh, batch))
    assert np.isfinite(float(m8["loss"]))

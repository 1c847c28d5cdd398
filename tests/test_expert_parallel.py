"""Expert parallelism (parallel/expert.py): the all_to_all-routed MoE FFN must
match the dense single-device reference — forward and grads — with expert
weights actually sharded, at EP=8 and composed EP(4) x DP(2)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from construction_clip_tpu.core.mesh import create_mesh, DATA_AXIS
from construction_clip_tpu.parallel.expert import (
    EXPERT_AXIS, init_moe, moe_ffn_dense, moe_ffn_ep)

D, F, E = 16, 32, 8


@pytest.fixture(scope="module")
def params():
    return init_moe(jax.random.key(3), D, F, E)


@pytest.fixture(scope="module")
def x():
    return jnp.asarray(np.random.default_rng(5).standard_normal((8, 4, D)),
                       jnp.float32)


def test_ep_matches_dense_forward(params, x):
    mesh = create_mesh({EXPERT_AXIS: 8})
    ref = moe_ffn_dense(params, x)
    got = moe_ffn_ep(params, x, mesh, capacity_factor=float(E))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=1e-6)
    # the routing must actually be sparse for the test to mean anything:
    # every expert used, no expert used by everything
    probs = jax.nn.softmax(x.reshape(-1, D) @ params["router"], axis=-1)
    counts = np.bincount(np.asarray(jnp.argmax(probs, -1)), minlength=E)
    assert counts.max() < 32 and (counts > 0).sum() >= E // 2


def test_ep_dp_composition(params, x):
    mesh = create_mesh({EXPERT_AXIS: 4, DATA_AXIS: 2})
    ref = moe_ffn_dense(params, x)
    got = moe_ffn_ep(params, x, mesh, capacity_factor=float(E),
                     dp_axis=DATA_AXIS)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=1e-6)


def test_ep_grads_match_dense(params, x):
    """jax.grad flows through dispatch/combine einsums and both all_to_alls:
    parameter grads of a scalar loss equal the dense reference's."""
    mesh = create_mesh({EXPERT_AXIS: 8})
    tgt = jnp.asarray(np.random.default_rng(9).standard_normal(x.shape),
                      jnp.float32)

    def loss_dense(p):
        return jnp.mean((moe_ffn_dense(p, x) - tgt) ** 2)

    def loss_ep(p):
        return jnp.mean((moe_ffn_ep(p, x, mesh, capacity_factor=float(E))
                         - tgt) ** 2)

    g_ref = jax.grad(loss_dense)(params)
    g_ep = jax.grad(loss_ep)(params)
    for k in g_ref:
        np.testing.assert_allclose(np.asarray(g_ep[k]), np.asarray(g_ref[k]),
                                   rtol=5e-5, atol=1e-7, err_msg=k)


def test_ep_capacity_drops_are_group_local(params, x):
    """With a tight capacity the GShard semantics drop overflow tokens by
    zeroing their gate: output rows for dropped tokens are exactly zero and
    kept rows still match a dense compute of those tokens."""
    mesh = create_mesh({EXPERT_AXIS: 8})
    got = np.asarray(moe_ffn_ep(params, x, mesh, capacity_factor=1.0))
    ref = np.asarray(moe_ffn_dense(params, x))
    flat_got = got.reshape(-1, D)
    flat_ref = ref.reshape(-1, D)
    dropped = np.all(flat_got == 0.0, axis=-1)
    assert dropped.any()          # capacity 1 must actually drop something
    assert not dropped.all()      # and keep something
    np.testing.assert_allclose(flat_got[~dropped], flat_ref[~dropped],
                               rtol=2e-5, atol=1e-6)


def test_ep_params_actually_sharded(params):
    """The expert stacks must live sharded P(EXPERT_AXIS) when placed on the
    mesh — one expert's weights per device at EP=8."""
    mesh = create_mesh({EXPERT_AXIS: 8})
    from jax.sharding import NamedSharding

    w = jax.device_put(params["w_in"], NamedSharding(mesh, P(EXPERT_AXIS)))
    shard_shapes = {s.data.shape for s in w.addressable_shards}
    assert shard_shapes == {(1, D, F)}

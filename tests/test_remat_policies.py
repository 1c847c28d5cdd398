"""Rematerialisation must be a pure memory/compute trade: every policy in
models/blocks.apply_stack (full checkpoint + each selective name policy) has to
produce the SAME loss and the same gradients as the no-remat stack.
Gradients differ only by fp32 reassociation (the remat program fuses
differently): measured max relative deviation 1.4e-7 on CPU, so the check is
allclose at 1e-6 of each leaf's max magnitude."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from construction_clip_tpu.models.blocks import apply_stack, init_stack
from construction_clip_tpu.ops.activations import quick_gelu

POLICIES = [True, "dots", "save_qkv", "save_mlp_hidden", "save_qkv_mlp",
            "save_qkv_attn_out", "save_preact", "save_attn_preact", "save_big"]


@pytest.fixture(scope="module")
def setup():
    params = init_stack(jax.random.key(0), layers=3, width=64)
    x = jax.random.normal(jax.random.key(1), (2, 10, 64), jnp.float32)

    def loss(p, x_, remat):
        out = apply_stack(p, x_, n_heads=4, act=quick_gelu, remat=remat,
                          unroll=1)
        return jnp.sum(out * out)

    return params, x, loss


def _assert_grads_close(base, got):
    for a, b in zip(jax.tree.leaves(base), jax.tree.leaves(got)):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a, b, rtol=1e-6,
                                   atol=1e-6 * max(np.abs(a).max(), 1e-30))


@pytest.mark.parametrize("policy", POLICIES, ids=str)
def test_policy_matches_no_remat(policy, setup):
    params, x, loss = setup
    base_l, base_g = jax.value_and_grad(loss)(params, x, False)
    l, g = jax.value_and_grad(loss)(params, x, policy)
    assert float(l) == float(base_l)
    _assert_grads_close(base_g, g)


def test_causal_policy_matches_no_remat(setup):
    """The text-tower configuration (causal mask) through the same policies."""
    params, x, _ = setup

    def loss(p, x_, remat):
        out = apply_stack(p, x_, n_heads=4, act=quick_gelu, is_causal=True,
                          remat=remat, unroll=1)
        return jnp.sum(out * out)

    base = jax.grad(loss)(params, x, False)
    for policy in ("save_qkv", "save_attn_preact"):
        g = jax.grad(loss)(params, x, policy)
        _assert_grads_close(base, g)

"""fused_adamw (train/state.py): single-traversal AdamW must match optax.adamw
exactly (same schedule/bias-correction/decay semantics) — it replaces optax's
3-transform chain to cut the optimizer's HBM passes (BASELINE.md attribution)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from construction_clip_tpu.train.state import make_adamw


def test_fused_matches_optax_adamw():
    params = {"a": jnp.linspace(-1, 1, 12).reshape(4, 3),
              "b": {"c": jnp.full((5,), 2.0), "d": jnp.zeros((2, 2))}}
    key = jax.random.key(0)

    def run(fused):
        tx = make_adamw(1e-3, warmup_steps=2, total_steps=10,
                        weight_decay=0.01, fused=fused)
        st = tx.init(params)
        p = params
        k = key
        for _ in range(5):
            k, sub = jax.random.split(k)
            g = jax.tree.map(
                lambda x: jax.random.normal(sub, x.shape) * 0.1, p)
            u, st = tx.update(g, st, p)
            p = optax.apply_updates(p, u)
        return p

    ref = run(False)
    got = run(True)
    for r, g in zip(jax.tree.leaves(ref), jax.tree.leaves(got)):
        np.testing.assert_allclose(np.asarray(r), np.asarray(g), rtol=1e-6)


def test_update_and_apply_matches_two_pass():
    """The single-traversal param update (apply_gradients' fused path) must be
    numerically identical to update() + optax.apply_updates."""
    params = {"a": jnp.linspace(-1, 1, 12).reshape(4, 3),
              "b": jnp.full((5,), 2.0)}
    tx = make_adamw(1e-3, warmup_steps=2, total_steps=10, weight_decay=0.01)
    assert hasattr(tx, "update_and_apply")
    st1 = tx.init(params)
    st2 = tx.init(params)
    g = jax.tree.map(lambda x: x * 0.1 + 0.05, params)
    u, st1 = tx.update(g, st1, params)
    p_ref = optax.apply_updates(params, u)
    p_got, st2 = tx.update_and_apply(g, st2, params)
    for r, got in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_got)):
        np.testing.assert_allclose(np.asarray(r), np.asarray(got), rtol=1e-7)
    for r, got in zip(jax.tree.leaves(st1), jax.tree.leaves(st2)):
        np.testing.assert_allclose(np.asarray(r), np.asarray(got), rtol=1e-7)


def test_fused_with_grad_clip():
    params = {"w": jnp.ones((3, 3))}
    tx = make_adamw(1e-2, warmup_steps=0, total_steps=100, grad_clip=1.0)
    st = tx.init(params)
    g = {"w": jnp.full((3, 3), 10.0)}
    u, st = tx.update(g, st, params)
    assert np.isfinite(np.asarray(u["w"])).all()

"""Fused attention-block kernel: value + gradient parity vs the composable path
(interpret mode on CPU; on-chip A/B lives in the module docstring)."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from construction_clip_tpu.models.blocks import init_block
from construction_clip_tpu.ops import pallas_attention_block as fab


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    from jax.experimental import pallas as pl

    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call", functools.partial(orig, interpret=True))


@pytest.mark.parametrize("causal", [False, True])
def test_matches_composable(causal, rng):
    D, H = 32, 2
    params = init_block(jax.random.key(0), D)
    x = jnp.asarray(rng.standard_normal((4, 12, D)).astype(np.float32))
    out = fab.fused_attention_block(x, params["ln_1"], params["attn"],
                                    n_heads=H, causal=causal)
    ref = fab._ref_math(x, params["ln_1"]["scale"], params["ln_1"]["bias"],
                        params["attn"]["w_qkv"], params["attn"]["b_qkv"],
                        params["attn"]["w_out"], params["attn"]["b_out"],
                        H, causal, 1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=3e-5, atol=3e-5)


def test_gradients_match(rng):
    D, H = 32, 2
    params = init_block(jax.random.key(1), D)
    x = jnp.asarray(rng.standard_normal((2, 8, D)).astype(np.float32))

    def loss_fused(x, p):
        return jnp.sum(fab.fused_attention_block(x, p["ln_1"], p["attn"],
                                                 n_heads=H) ** 2)

    def loss_ref(x, p):
        return jnp.sum(fab._ref_math(
            x, p["ln_1"]["scale"], p["ln_1"]["bias"], p["attn"]["w_qkv"],
            p["attn"]["b_qkv"], p["attn"]["w_out"], p["attn"]["b_out"],
            H, False, 1e-5) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1))(x, params)
    gr = jax.grad(loss_ref, argnums=(0, 1))(x, params)
    for a, b in zip(jax.tree.leaves(gf[0]) + jax.tree.leaves(gf[1]["ln_1"])
                    + jax.tree.leaves(gf[1]["attn"]),
                    jax.tree.leaves(gr[0]) + jax.tree.leaves(gr[1]["ln_1"])
                    + jax.tree.leaves(gr[1]["attn"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_gradients_match_multi_tile(causal, rng):
    """b=16 -> two grid steps: exercises the in-kernel dLN accumulation across
    the sequential grid, plus the causal backward."""
    D, H = 32, 2
    params = init_block(jax.random.key(2), D)
    x = jnp.asarray(rng.standard_normal((16, 8, D)).astype(np.float32))

    def loss_fused(x, p):
        return jnp.sum(fab.fused_attention_block(x, p["ln_1"], p["attn"],
                                                 n_heads=H, causal=causal) ** 2)

    def loss_ref(x, p):
        return jnp.sum(fab._ref_math(
            x, p["ln_1"]["scale"], p["ln_1"]["bias"], p["attn"]["w_qkv"],
            p["attn"]["b_qkv"], p["attn"]["w_out"], p["attn"]["b_out"],
            H, causal, 1e-5) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1))(x, params)
    gr = jax.grad(loss_ref, argnums=(0, 1))(x, params)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=2e-4)


def test_supported_gates():
    assert fab.supported(jnp.zeros((4, 12, 32)), 2)
    assert not fab.supported(jnp.zeros((4, 12, 33)), 2)      # heads don't divide
    assert not fab.supported(jnp.zeros((4, 512, 32)), 2)     # T too long
    assert not fab.supported(jnp.zeros((4, 12, 32), jnp.int8), 2)


def test_wide_tower_budget_tile(rng):
    """d=768 (ViT-L text width): the fwd batch tile steps down to 4 under the
    VMEM budget instead of rejecting the shape, and the kernel still matches
    the composable math."""
    D, H = 768, 12
    params = init_block(jax.random.key(2), D)
    x = jnp.asarray(rng.standard_normal((4, 12, D)).astype(np.float32))
    assert fab._fwd_batch_tile(4, 12, D, x.dtype.itemsize) == 4
    assert fab.supported(x, H)
    out = fab.fused_attention_block(x, params["ln_1"], params["attn"], n_heads=H)
    ref = fab._ref_math(x, params["ln_1"]["scale"], params["ln_1"]["bias"],
                        params["attn"]["w_qkv"], params["attn"]["b_qkv"],
                        params["attn"]["w_out"], params["attn"]["b_out"],
                        H, False, 1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-5, atol=5e-5)


def test_pack_factor(monkeypatch):
    """T<=64 shapes CAN pack multiple samples per 128-lane attention panel
    (mechanism kept but off by default — measured a slight loss on v5e at the
    ViT-B/32 train shape, see PACK_SAMPLES)."""
    assert fab._pack_factor(8, 50) == 1      # default: packing disabled
    monkeypatch.setattr(fab, "PACK_SAMPLES", True)
    assert fab._pack_factor(8, 50) == 2      # ViT-B/32 vision: 2x50=100 <= 128
    assert fab._pack_factor(8, 12) == 4
    assert fab._pack_factor(9, 40) == 3
    assert fab._pack_factor(5, 50) == 1      # batch not divisible
    assert fab._pack_factor(8, 77) == 1      # text tower: 154 > 128
    assert fab._pack_factor(8, 257) == 1     # ViT-L vision


@pytest.mark.parametrize("causal", [False, True])
def test_packed_matches_composable_vit_shape(causal, rng, monkeypatch):
    """The ViT-B/32 hot shape (T=50, pack=2): values AND gradients match the
    composable math — packed cross-sample probs are exactly zero, so packing
    changes only the MXU op schedule, never the result."""
    monkeypatch.setattr(fab, "PACK_SAMPLES", True)
    D, H = 64, 4
    params = init_block(jax.random.key(3), D)
    x = jnp.asarray(rng.standard_normal((4, 50, D)).astype(np.float32))
    assert fab._pack_factor(*x.shape[:2]) == 2

    def loss_fused(x, p):
        return jnp.sum(fab.fused_attention_block(x, p["ln_1"], p["attn"],
                                                 n_heads=H, causal=causal) ** 2)

    def loss_ref(x, p):
        return jnp.sum(fab._ref_math(
            x, p["ln_1"]["scale"], p["ln_1"]["bias"], p["attn"]["w_qkv"],
            p["attn"]["b_qkv"], p["attn"]["w_out"], p["attn"]["b_out"],
            H, causal, 1e-5) ** 2)

    out = fab.fused_attention_block(x, params["ln_1"], params["attn"],
                                    n_heads=H, causal=causal)
    ref = fab._ref_math(x, params["ln_1"]["scale"], params["ln_1"]["bias"],
                        params["attn"]["w_qkv"], params["attn"]["b_qkv"],
                        params["attn"]["w_out"], params["attn"]["b_out"],
                        H, causal, 1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)
    gf = jax.grad(loss_fused, argnums=(0, 1))(x, params)
    gr = jax.grad(loss_ref, argnums=(0, 1))(x, params)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=2e-4)

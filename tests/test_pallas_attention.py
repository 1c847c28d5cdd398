"""Pallas fused attention vs the XLA reference path (interpret mode on CPU; the same
kernel compiles natively on TPU — exercised by bench)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from construction_clip_tpu.ops.attention import mha
from construction_clip_tpu.ops import pallas_attention


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    """CPU test backend: run the kernel in the Pallas interpreter."""
    import functools

    from jax.experimental import pallas as pl

    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call", functools.partial(orig, interpret=True))
    # flash_attention is jitted at import; rebuild it to pick up the patch
    monkeypatch.setattr(pallas_attention, "flash_attention",
                        pallas_attention.flash_attention.__wrapped__)
    yield


@pytest.mark.parametrize("shape,causal", [
    ((2, 4, 50, 64), False),   # ViT-B/32 vision tower shape
    ((2, 8, 77, 64), True),    # CLIP text tower shape
    ((1, 2, 16, 32), False),
])
def test_matches_xla_path(shape, causal, rng):
    b, h, t, d = shape
    q = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    k = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    v = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    assert pallas_attention.supported(q, k, v)
    ref = mha(q, k, v, is_causal=causal, impl="xla")
    out = pallas_attention.flash_attention(q, k, v, is_causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_bf16(rng):
    shape = (2, 2, 24, 32)
    q = jnp.asarray(rng.standard_normal(shape), dtype=jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal(shape), dtype=jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal(shape), dtype=jnp.bfloat16)
    ref = mha(q, k, v, impl="xla")
    out = pallas_attention.flash_attention(q, k, v)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, dtype=np.float32),
                               np.asarray(ref, dtype=np.float32), rtol=3e-2, atol=3e-2)


def test_supported_gates(rng):
    q = jnp.zeros((1, 2, 16, 32))
    assert not pallas_attention.supported(q, q, q, bias=jnp.zeros((1, 1, 1, 16)))
    assert not pallas_attention.supported(q, jnp.zeros((1, 2, 8, 32)),
                                          jnp.zeros((1, 2, 8, 32)))
    assert not pallas_attention.supported(q.astype(jnp.int8), q, q)


def test_mha_dispatches_to_pallas(rng):
    from construction_clip_tpu.ops import attention as attn_mod

    shape = (1, 2, 16, 32)
    q = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    ref = mha(q, q, q, impl="xla")
    out = mha(q, q, q, impl="pallas")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_gradients_match_xla(rng):
    """custom_vjp backward must match autodiff through the XLA path."""
    shape = (2, 2, 24, 32)
    q = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    k = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    v = jnp.asarray(rng.standard_normal(shape).astype(np.float32))

    for causal in (False, True):
        def loss_pallas(q, k, v):
            return jnp.sum(pallas_attention.flash_attention(
                q, k, v, is_causal=causal) ** 2)

        def loss_xla(q, k, v):
            return jnp.sum(mha(q, k, v, is_causal=causal, impl="xla") ** 2)

        gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
        gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gp, gx):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-5)


def test_pallas_normalize_matches_reference(rng):
    from construction_clip_tpu.ops import pallas_preprocess
    from construction_clip_tpu.data.preprocess import CLIP_MEAN, CLIP_STD

    imgs = (rng.random((2, 32, 16, 3)) * 255).astype(np.uint8)
    out = pallas_preprocess.normalize_u8.__wrapped__(
        jnp.asarray(imgs), mean=CLIP_MEAN, std=CLIP_STD)
    ref = (imgs.astype(np.float32) / 255.0 - np.asarray(CLIP_MEAN)) / np.asarray(CLIP_STD)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_fused_mlp_matches_reference(rng):
    from construction_clip_tpu.ops import pallas_mlp

    d, hidden = 32, 128
    x = jnp.asarray(rng.standard_normal((2, 12, d)).astype(np.float32))
    params = {
        "w_fc": jnp.asarray(rng.standard_normal((d, hidden)).astype(np.float32) * 0.1),
        "b_fc": jnp.asarray(rng.standard_normal((hidden,)).astype(np.float32) * 0.1),
        "w_proj": jnp.asarray(rng.standard_normal((hidden, d)).astype(np.float32) * 0.1),
        "b_proj": jnp.asarray(rng.standard_normal((d,)).astype(np.float32) * 0.1),
    }
    ln = {"scale": jnp.asarray(1 + 0.1 * rng.standard_normal(d).astype(np.float32)),
          "bias": jnp.asarray(0.1 * rng.standard_normal(d).astype(np.float32))}
    out = pallas_mlp.fused_mlp_residual(x, params, ln)
    ref = pallas_mlp._ref_math(x, ln["scale"], ln["bias"], params["w_fc"],
                               params["b_fc"], params["w_proj"], params["b_proj"], 1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)

    # gradients through the custom vjp
    def loss_fused(x, p, l):
        return jnp.sum(pallas_mlp.fused_mlp_residual(x, p, l) ** 2)

    def loss_ref(x, p, l):
        return jnp.sum(pallas_mlp._ref_math(x, l["scale"], l["bias"], p["w_fc"],
                                            p["b_fc"], p["w_proj"], p["b_proj"],
                                            1e-5) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, params, ln)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, params, ln)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("shape,causal", [
    ((2, 4, 257, 64), False),  # ViT-L/14 image tower shape (odd T)
    ((2, 4, 77, 64), True),
])
def test_pallas_backward_matches_jnp(shape, causal, rng):
    """The VMEM-resident Pallas backward == the analytic jnp backward (the
    path it replaces on TPU) AND jax.vjp through the XLA reference math."""
    q = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    k = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    v = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    g = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    scale = shape[-1] ** -0.5

    got = pallas_attention._bwd_pallas(q, k, v, g, causal, scale, interpret=True)
    want = pallas_attention._bwd_math(q, k, v, g, causal, scale)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)

    _, vjp = jax.vjp(lambda q_, k_, v_: mha(q_, k_, v_, is_causal=causal,
                                            impl="xla"), q, k, v)
    for a, b in zip(got, vjp(g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_pallas_backward_bf16(rng):
    """bf16 operands (the ViT-L training dtype): kernel == jnp math in fp32
    accumulation, outputs cast back to bf16."""
    shape = (1, 4, 257, 64)
    mk = lambda: jnp.asarray(rng.standard_normal(shape), dtype=jnp.bfloat16)
    q, k, v, g = mk(), mk(), mk(), mk()
    scale = shape[-1] ** -0.5
    got = pallas_attention._bwd_pallas(q, k, v, g, False, scale, interpret=True)
    want = pallas_attention._bwd_math(q, k, v, g, False, scale)
    for a, b in zip(got, want):
        assert a.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=3e-2, atol=3e-2)


def test_split_point_gates():
    """Lane-aligned key split fires only for non-causal awkward T with a tiny
    remainder (ViT CLS-token shapes); causal/aligned/large-remainder shapes
    keep the monolithic panel."""
    assert pallas_attention._split_point(257, False) == 256   # ViT-L/14
    assert pallas_attention._split_point(131, False) == 128
    assert pallas_attention._split_point(257, True) == 0      # causal: masked
    assert pallas_attention._split_point(256, False) == 0     # already aligned
    assert pallas_attention._split_point(140, False) == 0     # r=12 > 4
    assert pallas_attention._split_point(50, False) == 0      # single panel


@pytest.mark.parametrize("t", [131, 257])
def test_forward_split_matches_xla(t, rng):
    """The split forward (MXU main panel + VPU remainder keys) == XLA softmax
    attention at the shapes where _split_point fires."""
    shape = (2, 2, t, 64)
    q = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    k = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    v = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    assert pallas_attention._split_point(t, False) == (t // 128) * 128
    ref = mha(q, k, v, is_causal=False, impl="xla")
    out = pallas_attention.flash_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

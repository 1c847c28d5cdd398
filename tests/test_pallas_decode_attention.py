"""Fused decode-step attention kernel vs the XLA multiply-reduce path
(interpret mode on CPU; the on-chip A/B lives in the module docstring)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from construction_clip_tpu.models.gpt2 import _attn_over_cache
from construction_clip_tpu.ops.pallas_decode_attention import (
    decode_step_attention, supported_config)

L, B, H, T, DH = 3, 4, 2, 24, 8


@pytest.fixture(scope="module")
def qkv():
    q = jax.random.normal(jax.random.key(1), (B, H, 1, DH), jnp.float32)
    ck = jax.random.normal(jax.random.key(2), (L, B, H, T, DH), jnp.float32)
    cv = jax.random.normal(jax.random.key(3), (L, B, H, T, DH), jnp.float32)
    return q, ck, cv


@pytest.mark.parametrize("layer", [0, L - 1])
@pytest.mark.parametrize("cache_len", [0, 5, T - 1])
def test_matches_attn_over_cache(qkv, layer, cache_len):
    q, ck, cv = qkv
    out = decode_step_attention(q, ck, cv, jnp.int32(layer),
                                jnp.int32(cache_len), interpret=True)
    ref = _attn_over_cache(q, ck[layer], cv[layer], jnp.int32(cache_len), None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_bf16_shapes(qkv):
    q, ck, cv = (x.astype(jnp.bfloat16) for x in qkv)
    out = decode_step_attention(q, ck, cv, jnp.int32(1), jnp.int32(7),
                                interpret=True)
    assert out.shape == (B, H, 1, DH) and out.dtype == jnp.bfloat16
    ref = _attn_over_cache(q, ck[1], cv[1], jnp.int32(7), None)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=0.02)


def test_supported_config_gates():
    from construction_clip_tpu.core.configs import GPT2Config

    cfg = GPT2Config()
    assert supported_config(cfg, None, None)
    assert not supported_config(cfg, jnp.zeros((B, 1, 1, T)), None)
    assert not supported_config(cfg, None, jnp.zeros((B, T), jnp.int32))

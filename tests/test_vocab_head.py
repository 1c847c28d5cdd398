"""Vocab-head decode fast path (ops/pallas_vocab_head.py) + the int8 T5 head
serving config (models/t5.quantize_t5_head)."""

import numpy as np

import jax
import jax.numpy as jnp

from construction_clip_tpu.core.configs import T5Config
from construction_clip_tpu.core.precision import BF16_POLICY
from construction_clip_tpu.models.t5 import (
    _cast_params, init_t5, quantize_t5_head, t5_decode, t5_init_cache)
from construction_clip_tpu.ops.pallas_vocab_head import (
    MAX_ROWS, supported, vocab_head_logits)

RNG = np.random.default_rng(3)


def test_kernel_matches_xla_bf16():
    d, v = 64, 384  # v % 128 == 0
    w = jnp.asarray(RNG.standard_normal((d, v)) * 0.05, jnp.bfloat16)
    x = jnp.asarray(RNG.standard_normal((3, d)), jnp.bfloat16)
    assert supported(3, w)
    got = vocab_head_logits(x, w, interpret=True)
    ref = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    assert got.shape == (3, v) and got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_kernel_matches_dequant_int8():
    d, v = 64, 256
    w = RNG.standard_normal((d, v)).astype(np.float32) * 0.05
    s = (np.abs(w).max(0) / 127.0).astype(np.float32)
    q = jnp.asarray(np.clip(np.round(w / s), -127, 127).astype(np.int8))
    x = jnp.asarray(RNG.standard_normal((1, d)), jnp.bfloat16)
    got = vocab_head_logits(x, q, jnp.asarray(s), interpret=True)
    ref = jax.lax.dot_general(x, q.astype(jnp.bfloat16),
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32) * s
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_supported_gate():
    w = jnp.zeros((64, 384), jnp.bfloat16)
    assert supported(MAX_ROWS, w)
    assert not supported(MAX_ROWS + 1, w)          # batch too large
    assert not supported(1, jnp.zeros((64, 385), jnp.bfloat16))  # not tileable
    assert not supported(1, jnp.zeros((64, 384), jnp.float32))   # dtype


def test_quantized_head_decode_close_and_scale_stays_f32():
    cfg = T5Config.tiny()  # untied? tiny follows mt5: check lm_head presence
    params = init_t5(jax.random.key(0), cfg)
    assert "lm_head" in params, "mt5 configs are untied (models/t5.py:15)"
    qparams = quantize_t5_head(params)

    # _cast_params must bf16 the tree but leave the int8 head dict intact
    cast = _cast_params(qparams, BF16_POLICY)
    assert cast["lm_head"]["q"].dtype == jnp.int8
    assert cast["lm_head"]["s"].dtype == jnp.float32
    assert cast["shared"].dtype == jnp.bfloat16

    enc = jnp.asarray(RNG.standard_normal((2, 5, cfg.d_model)), jnp.float32)
    ids = jnp.asarray(RNG.integers(2, cfg.vocab_size, (2, 4)), jnp.int32)

    ref, _ = t5_decode(params, cfg, ids, enc)
    got, _ = t5_decode(qparams, cfg, ids, enc)
    # int8 weight quantization error only — logits track closely
    err = np.max(np.abs(np.asarray(got) - np.asarray(ref)))
    rng_mag = np.max(np.abs(np.asarray(ref))) + 1e-6
    assert err / rng_mag < 0.05, (err, rng_mag)


def test_quantized_head_cached_decode_runs():
    cfg = T5Config.tiny()
    params = quantize_t5_head(init_t5(jax.random.key(1), cfg))
    enc = jnp.asarray(RNG.standard_normal((2, 5, cfg.d_model)), jnp.float32)
    cache = t5_init_cache(params, cfg, enc, max_len=4)
    ids = jnp.zeros((2, 1), jnp.int32)
    logits, cache = t5_decode(params, cfg, ids, enc, cache=cache)
    assert logits.shape == (2, 1, cfg.vocab_size)
    logits, _ = t5_decode(params, cfg, ids, enc, cache=cache)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_pad_to_tile_and_sliced_logits():
    from construction_clip_tpu.ops.pallas_vocab_head import pad_to_tile
    from construction_clip_tpu.models.t5 import _head_logits

    d, v = 32, 300  # not a multiple of anything useful
    w = jnp.asarray(RNG.standard_normal((d, v)) * 0.05, jnp.bfloat16)
    wp, _ = pad_to_tile(w, None, tile=128)
    assert wp.shape == (d, 384)
    x = jnp.asarray(RNG.standard_normal((2, 1, d)), jnp.bfloat16)
    # CPU -> XLA fallback path; padded columns must be sliced away
    got = _head_logits(wp, x, v, cached_step=True)
    ref = _head_logits(w, x, v, cached_step=True)
    assert got.shape == (2, 1, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_prepare_decode_head_noop_off_tpu():
    cfg = T5Config.tiny()
    from construction_clip_tpu.models.t5 import prepare_decode_head

    params = init_t5(jax.random.key(2), cfg)
    out = prepare_decode_head(params, cfg)  # CPU in tests: identity
    assert out["lm_head"].shape == params["lm_head"].shape

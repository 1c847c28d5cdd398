"""mT5 parity vs torch HF MT5ForConditionalGeneration (random init, offline):
encoder states, seq2seq logits, injected-encoder-states path, and KV-cache decode."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from construction_clip_tpu.core.configs import T5Config
from construction_clip_tpu.models.t5 import (
    t5_encode, t5_decode, t5_forward, t5_init_cache, from_hf_state_dict)

CFG = T5Config.tiny()


@pytest.fixture(scope="module")
def pair():
    hf_cfg = transformers.MT5Config(
        vocab_size=CFG.vocab_size, d_model=CFG.d_model, d_kv=CFG.d_kv, d_ff=CFG.d_ff,
        num_layers=CFG.num_layers, num_decoder_layers=CFG.num_decoder_layers,
        num_heads=CFG.num_heads, tie_word_embeddings=CFG.tie_word_embeddings,
        relative_attention_num_buckets=CFG.relative_attention_num_buckets,
        relative_attention_max_distance=CFG.relative_attention_max_distance,
        dropout_rate=0.0)
    torch.manual_seed(5)
    hf = transformers.MT5ForConditionalGeneration(hf_cfg).eval()
    params = from_hf_state_dict(hf.state_dict(), CFG)
    return hf, params


def test_encoder_matches(pair, rng):
    hf, params = pair
    ids = rng.integers(1, CFG.vocab_size, (2, 9))
    mask = np.ones((2, 9), np.int64)
    mask[1, 6:] = 0
    with torch.no_grad():
        ref = hf.encoder(input_ids=torch.from_numpy(ids),
                         attention_mask=torch.from_numpy(mask)).last_hidden_state
    ours = t5_encode(params, CFG, jnp.asarray(ids.astype(np.int32)),
                     attention_mask=jnp.asarray(mask.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=3e-4, atol=3e-5)


def test_seq2seq_logits_match(pair, rng):
    hf, params = pair
    ids = rng.integers(1, CFG.vocab_size, (2, 7))
    dec = rng.integers(1, CFG.vocab_size, (2, 5))
    with torch.no_grad():
        ref = hf(input_ids=torch.from_numpy(ids),
                 decoder_input_ids=torch.from_numpy(dec)).logits
    ours, _ = t5_forward(params, CFG, input_ids=jnp.asarray(ids.astype(np.int32)),
                         decoder_input_ids=jnp.asarray(dec.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=3e-4, atol=3e-4)


def test_injected_encoder_states(pair, rng):
    """The ClipCap trick: prepend prefix vectors to the encoder output
    (reference train_t5.py:233,265-270) — must match HF's encoder_outputs= path."""
    hf, params = pair
    from transformers.modeling_outputs import BaseModelOutput

    ids = rng.integers(1, CFG.vocab_size, (2, 6))
    prefix = rng.standard_normal((2, 3, CFG.d_model)).astype(np.float32)
    dec = rng.integers(1, CFG.vocab_size, (2, 4))
    with torch.no_grad():
        enc = hf.encoder(input_ids=torch.from_numpy(ids)).last_hidden_state
        cat = torch.cat([torch.from_numpy(prefix), enc], dim=1)
        ref = hf(encoder_outputs=BaseModelOutput(last_hidden_state=cat),
                 decoder_input_ids=torch.from_numpy(dec)).logits
    enc_j = t5_encode(params, CFG, jnp.asarray(ids.astype(np.int32)))
    cat_j = jnp.concatenate([jnp.asarray(prefix), enc_j], axis=1)
    ours, _ = t5_forward(params, CFG, encoder_hidden=cat_j,
                         decoder_input_ids=jnp.asarray(dec.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=3e-4, atol=3e-4)


def test_kv_cache_decode(pair, rng):
    """Incremental decode with T5Cache == teacher-forced full decode."""
    _, params = pair
    ids = rng.integers(1, CFG.vocab_size, (2, 6)).astype(np.int32)
    dec = rng.integers(1, CFG.vocab_size, (2, 5)).astype(np.int32)
    enc = t5_encode(params, CFG, jnp.asarray(ids))
    full, _ = t5_decode(params, CFG, jnp.asarray(dec), enc)

    cache = t5_init_cache(params, CFG, enc, max_len=8)
    for t in range(dec.shape[1]):
        step, cache = t5_decode(params, CFG, jnp.asarray(dec[:, t:t + 1]), enc,
                                cache=cache)
        np.testing.assert_allclose(np.asarray(step[:, 0]), np.asarray(full[:, t]),
                                   rtol=2e-4, atol=2e-4)
    assert int(cache.length) == dec.shape[1]

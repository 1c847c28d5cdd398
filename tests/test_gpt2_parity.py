"""GPT-2 decoder parity vs torch HF GPT2LMHeadModel (random init, offline) and
KV-cache consistency: incremental decode must reproduce full-sequence logits."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from construction_clip_tpu.core.configs import GPT2Config
from construction_clip_tpu.models.gpt2 import (
    gpt2_forward, from_hf_state_dict, KVCache, embed_tokens)


@pytest.fixture(scope="module")
def pair():
    cfg = GPT2Config.tiny()
    hf_cfg = transformers.GPT2Config(
        vocab_size=cfg.vocab_size, n_positions=cfg.n_positions, n_embd=cfg.n_embd,
        n_layer=cfg.n_layer, n_head=cfg.n_head)
    torch.manual_seed(1)
    hf = transformers.GPT2LMHeadModel(hf_cfg).eval()
    params = from_hf_state_dict(hf.state_dict(), cfg)
    return cfg, hf, params


def test_token_logits_match(pair, rng):
    cfg, hf, params = pair
    toks = rng.integers(0, cfg.vocab_size, (2, 12))
    with torch.no_grad():
        ref = hf(input_ids=torch.from_numpy(toks)).logits.numpy()
    ours, _ = gpt2_forward(params, cfg, tokens=jnp.asarray(toks.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-5)


def test_inputs_embeds_match(pair, rng):
    cfg, hf, params = pair
    emb = rng.standard_normal((2, 9, cfg.n_embd)).astype(np.float32) * 0.05
    with torch.no_grad():
        ref = hf(inputs_embeds=torch.from_numpy(emb)).logits.numpy()
    ours, _ = gpt2_forward(params, cfg, inputs_embeds=jnp.asarray(emb))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-5)


def test_kv_cache_matches_full(pair, rng):
    cfg, _, params = pair
    B, T = 2, 10
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)).astype(np.int32))
    full, _ = gpt2_forward(params, cfg, tokens=toks)

    cache = KVCache.create(cfg, B, max_len=16)
    # prefill first 4, then decode one token at a time
    logits, cache = gpt2_forward(params, cfg, tokens=toks[:, :4], cache=cache)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(full[:, :4]),
                               rtol=1e-4, atol=1e-5)
    for t in range(4, T):
        logits, cache = gpt2_forward(params, cfg, tokens=toks[:, t:t + 1], cache=cache)
        np.testing.assert_allclose(np.asarray(logits[:, 0]), np.asarray(full[:, t]),
                                   rtol=1e-4, atol=1e-5)
    assert int(cache.length) == T


def test_embed_tokens(pair):
    cfg, hf, params = pair
    toks = jnp.asarray([[1, 2, 3]], dtype=jnp.int32)
    ours = embed_tokens(params, toks)
    with torch.no_grad():
        ref = hf.transformer.wte(torch.tensor([[1, 2, 3]])).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-6)

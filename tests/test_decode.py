"""Decode-loop parity: our KV-cached jitted loops must produce token-for-token the
same captions as the reference's full-recompute torch loops (generate2 greedy and
generate_beam semantics, reference CLIP_prefix_caption/test.py:353-514), run here
against the same tiny random GPT-2."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from construction_clip_tpu.core.configs import GPT2Config
from construction_clip_tpu.models.gpt2 import from_hf_state_dict
from construction_clip_tpu.infer.decode import greedy_decode, beam_decode, sample_decode

GCFG = GPT2Config(vocab_size=50, n_positions=128, n_embd=32, n_layer=2, n_head=2)
STOP = 7


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(4)
    hf = transformers.GPT2LMHeadModel(transformers.GPT2Config(
        vocab_size=GCFG.vocab_size, n_positions=GCFG.n_positions,
        n_embd=GCFG.n_embd, n_layer=GCFG.n_layer, n_head=GCFG.n_head)).eval()
    params = from_hf_state_dict(hf.state_dict(), GCFG)
    return hf, params


def torch_greedy(hf, embed, max_steps, stop):
    """Reference generate2 semantics: full recompute, argmax of top-p-filtered logits
    (== plain argmax)."""
    generated = torch.from_numpy(embed)
    toks = []
    with torch.no_grad():
        for _ in range(max_steps):
            logits = hf(inputs_embeds=generated).logits[:, -1, :]
            nxt = torch.argmax(logits, -1)
            toks.append(int(nxt))
            emb = hf.transformer.wte(nxt)[None]
            generated = torch.cat([generated, emb], dim=1)
            if int(nxt) == stop:
                break
    return toks


def torch_beam(hf, embed, beam, max_steps, stop, temp):
    """Reference generate_beam bookkeeping (test.py:353-440), full recompute."""
    generated = torch.from_numpy(embed)
    scores = None
    tokens = None
    seq_lengths = torch.ones(beam)
    is_stopped = torch.zeros(beam, dtype=torch.bool)
    with torch.no_grad():
        for _ in range(max_steps):
            logits = hf(inputs_embeds=generated).logits[:, -1, :] / temp
            logp = logits.softmax(-1).log()
            if scores is None:
                scores, next_tokens = logp.topk(beam, -1)
                generated = generated.expand(beam, *generated.shape[1:])
                next_tokens, scores = next_tokens.permute(1, 0), scores.squeeze(0)
                tokens = next_tokens
            else:
                logp[is_stopped] = -float("inf")
                logp[is_stopped, 0] = 0
                scores_sum = scores[:, None] + logp
                seq_lengths[~is_stopped] += 1
                avg = scores_sum / seq_lengths[:, None]
                avg, next_tokens = avg.view(-1).topk(beam, -1)
                src = next_tokens // scores_sum.shape[1]
                seq_lengths = seq_lengths[src]
                next_tokens = (next_tokens % scores_sum.shape[1]).unsqueeze(1)
                tokens = torch.cat([tokens[src], next_tokens], dim=1)
                generated = generated[src]
                scores = avg * seq_lengths
                is_stopped = is_stopped[src]
            emb = hf.transformer.wte(next_tokens.squeeze()).view(generated.shape[0], 1, -1)
            generated = torch.cat([generated, emb], dim=1)
            is_stopped = is_stopped | next_tokens.eq(stop).squeeze()
            if is_stopped.all():
                break
    scores = scores / seq_lengths
    order = scores.argsort(descending=True)
    return ([tokens[i].tolist()[: int(seq_lengths[i])] for i in order],
            scores[order].tolist(),
            [int(l) for l in seq_lengths[order]])


def test_greedy_matches_reference_loop(pair, rng):
    hf, params = pair
    embed = (rng.standard_normal((1, 5, GCFG.n_embd)) * 0.1).astype(np.float32)
    ref = torch_greedy(hf, embed, 20, STOP)
    res = greedy_decode(params, GCFG, jnp.asarray(embed), max_steps=20, stop_token=STOP)
    ours = list(np.asarray(res.tokens[0][: int(res.lengths[0])]))
    assert ours == ref


def test_greedy_batched(pair, rng):
    hf, params = pair
    embeds = (rng.standard_normal((3, 4, GCFG.n_embd)) * 0.1).astype(np.float32)
    res = greedy_decode(params, GCFG, jnp.asarray(embeds), max_steps=15, stop_token=STOP)
    for i in range(3):
        ref = torch_greedy(hf, embeds[i:i + 1], 15, STOP)
        ours = list(np.asarray(res.tokens[i][: int(res.lengths[i])]))
        assert ours == ref, (i, ours, ref)


def test_beam_matches_reference_loop(pair, rng):
    hf, params = pair
    embed = (rng.standard_normal((1, 5, GCFG.n_embd)) * 0.1).astype(np.float32)
    ref_toks, ref_scores, ref_lens = torch_beam(hf, embed, 3, 25, STOP, 0.5)
    res = beam_decode(params, GCFG, jnp.asarray(embed), beam_size=3, max_steps=25,
                      stop_token=STOP, temperature=0.5)
    for k in range(3):
        ours = list(np.asarray(res.tokens[0, k][: int(res.lengths[0, k])]))
        assert ours == ref_toks[k], (k, ours, ref_toks[k])
        np.testing.assert_allclose(float(res.scores[0, k]), ref_scores[k], rtol=1e-3)


def test_sample_decode_contract(pair, rng):
    _, params = pair
    embeds = (rng.standard_normal((2, 4, GCFG.n_embd)) * 0.1).astype(np.float32)
    res = sample_decode(params, GCFG, jnp.asarray(embeds), jax.random.key(0),
                        max_steps=10, stop_token=STOP, top_p=0.8)
    assert res.tokens.shape == (2, 10)
    assert (res.lengths <= 10).all()
    # deterministic given the key
    res2 = sample_decode(params, GCFG, jnp.asarray(embeds), jax.random.key(0),
                         max_steps=10, stop_token=STOP, top_p=0.8)
    np.testing.assert_array_equal(np.asarray(res.tokens), np.asarray(res2.tokens))


def test_unroll_flag_equivalence(pair, rng):
    """The UNROLL_DECODE A/B flag (models/gpt2) must not change tokens."""
    import construction_clip_tpu.models.gpt2 as gpt2_mod

    _, params = pair
    embeds = jnp.asarray(rng.standard_normal((3, 5, GCFG.n_embd)), jnp.float32)
    out_scan = greedy_decode(params, GCFG, embeds, max_steps=12, stop_token=STOP)
    # the flag is read at TRACE time: without clearing the jit cache the
    # second call would replay the scan-path executable and never exercise
    # the unrolled branch (_drive_decode_ab.py does the same)
    gpt2_mod.UNROLL_DECODE = True
    jax.clear_caches()
    try:
        out_unroll = greedy_decode(params, GCFG, embeds, max_steps=12,
                                   stop_token=STOP)
    finally:
        gpt2_mod.UNROLL_DECODE = False
        jax.clear_caches()
    np.testing.assert_array_equal(np.asarray(out_scan.tokens),
                                  np.asarray(out_unroll.tokens))


def test_prefill_matches_uncached_forward(pair, rng):
    """Prefill into a PADDED cache window must produce the same last-token
    logits as the plain uncached forward — in fp32 AND bf16 compute. The
    padded-window read path regressed on the TPU backend in round 4 (bf16
    prefill returned garbage; tools/diag_prefill_fix.py), so prefill now
    attends over the chunk's fresh q/k/v; this pins the logic equivalence."""
    from construction_clip_tpu.core.precision import BF16_POLICY, DEFAULT_POLICY
    from construction_clip_tpu.infer.decode import _prefill, _precast
    from construction_clip_tpu.models.gpt2 import gpt2_forward

    _, params = pair
    embeds = jnp.asarray(rng.standard_normal((2, 6, GCFG.n_embd)) * 0.1,
                         jnp.float32)
    for policy, tol in ((DEFAULT_POLICY, 1e-5), (BF16_POLICY, 5e-2)):
        p = _precast(params, policy)
        ref, _ = gpt2_forward(p, GCFG, inputs_embeds=embeds, policy=policy)
        last, cache = _prefill(p, GCFG, embeds, 10, policy)
        np.testing.assert_allclose(np.asarray(last, np.float32),
                                   np.asarray(ref[:, -1], np.float32),
                                   atol=tol, rtol=tol)
        # the cache rows written by prefill must equal an exact-size window's
        assert int(cache.length) == 6
        assert cache.k.shape[3] == 16

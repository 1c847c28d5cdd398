"""Autoregressive decoding for the captioner: greedy, nucleus, and beam search —
all KV-cached, static-shape, and fully jittable (`lax.while_loop`).

Reference decode (reference CLIP_prefix_caption/test.py:353-514, application.py:152-229)
re-runs GPT-2 over the ENTIRE growing sequence every step (test.py:380-381): O(n^2) work
per caption and a new compile per length under jit. Here generation is the TPU-native
loop: prefill the prompt embeddings once into an HBM KV cache, then each step feeds one
token, with beams folded into the batch dimension.

Semantics preserved from the reference:
  - generate_beam (test.py:353-440): temperature applied before log_softmax (default
    0.5 at the predict call), stopped beams forced to token 0 at zero score
    (test.py:405-406), running scores length-NORMALIZED for beam selection
    (test.py:409), selection by flat top-k over beam*vocab, final ranking by
    score/length descending (test.py:429-435). Stop token 102 ([SEP] in BERT-chinese).
  - generate2 (test.py:443-514): despite the nucleus filter it takes ARGMAX of the
    filtered logits (test.py:500) — the top-1 token always survives top-p filtering, so
    generate2 IS greedy decoding; greedy_decode reproduces it exactly. True stochastic
    top-p sampling (sample_decode) is provided as the framework feature the reference
    aimed at.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from construction_clip_tpu.core.configs import GPT2Config
from construction_clip_tpu.core.precision import Policy, DEFAULT_POLICY
from construction_clip_tpu.models.gpt2 import KVCache, gpt2_forward

NEG_INF = jnp.finfo(jnp.float32).min


class DecodeResult(NamedTuple):
    tokens: jax.Array   # [B, max_steps] (beam: [B, beam, max_steps])
    lengths: jax.Array  # [B] (beam: [B, beam]) — generated tokens incl. stop token
    scores: jax.Array   # beam only: [B, beam] length-normalized log-prob, sorted desc


def _precast(params, policy):
    """Cast params to compute dtype ONCE at decode entry so the per-step
    cast_to_compute inside the while_loop body is a dtype-identity no-op XLA
    folds away (the T5 loop measured 2.6x over the dispatch floor from
    re-casting the embedding/lm tables every step). Quantized trees pass
    through untouched — casting their fp32 scales would change numerics."""
    from construction_clip_tpu.models.gpt2 import _is_quantized

    return params if _is_quantized(params) else policy.cast_to_compute(params)


def _prefill(params, gcfg, embeds, max_steps, policy):
    b, t0, _ = embeds.shape
    cache = KVCache.create(gcfg, b, t0 + max_steps, dtype=policy.compute_dtype)
    logits, cache = gpt2_forward(params, gcfg, inputs_embeds=embeds, cache=cache,
                                 policy=policy)
    return logits[:, -1], cache


@functools.partial(jax.jit, static_argnames=("gcfg", "max_steps", "stop_token", "policy"))
def greedy_decode(params, gcfg: GPT2Config, embeds, *, max_steps: int = 67,
                  stop_token: int = 102, temperature: float = 1.0,
                  policy: Policy = DEFAULT_POLICY) -> DecodeResult:
    """embeds: [B, T0, n_embd] prompt embeddings. Greedy argmax decode — exact
    generate2 behavior (see module docstring)."""
    b = embeds.shape[0]
    params = _precast(params, policy)
    last, cache = _prefill(params, gcfg, embeds, max_steps, policy)

    def cond(s):
        step, _, done, _, _ = s
        return (step < max_steps) & ~jnp.all(done)

    def body(s):
        step, toks, done, cache, last = s
        nxt = jnp.argmax(last, axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, 0, nxt)
        toks = toks.at[:, step].set(nxt)
        done = done | (nxt == stop_token)
        logits, cache = gpt2_forward(params, gcfg, tokens=nxt[:, None], cache=cache,
                                     policy=policy)
        return step + 1, toks, done, cache, logits[:, 0]

    init = (jnp.zeros((), jnp.int32), jnp.zeros((b, max_steps), jnp.int32),
            jnp.zeros((b,), bool), cache, last)
    _, toks, done, _, _ = jax.lax.while_loop(cond, body, init)
    lengths = jnp.where(
        jnp.any(toks == stop_token, axis=-1),
        jnp.argmax(toks == stop_token, axis=-1) + 1, max_steps)
    return DecodeResult(tokens=toks, lengths=lengths, scores=jnp.zeros((b,)))


def _top_p_filter(logits, top_p: float):
    """Mask logits outside the smallest set with cumulative prob > top_p (the
    first-above-threshold token is kept, as in the reference shift at test.py:493-496)."""
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep_sorted = (cum - probs) <= top_p  # keep while mass BEFORE this token <= p
    # threshold in logit space: smallest kept logit per row
    thresh = jnp.min(jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1, keepdims=True)
    return jnp.where(logits >= thresh, logits, NEG_INF)


@functools.partial(jax.jit, static_argnames=("gcfg", "max_steps", "stop_token", "policy"))
def sample_decode(params, gcfg: GPT2Config, embeds, key, *, max_steps: int = 67,
                  stop_token: int = 102, top_p: float = 0.8, temperature: float = 1.0,
                  policy: Policy = DEFAULT_POLICY) -> DecodeResult:
    """True nucleus (top-p) sampling with explicit PRNG key."""
    b = embeds.shape[0]
    params = _precast(params, policy)
    last, cache = _prefill(params, gcfg, embeds, max_steps, policy)

    def cond(s):
        step, _, done, _, _, _ = s
        return (step < max_steps) & ~jnp.all(done)

    def body(s):
        step, toks, done, cache, last, key = s
        key, sub = jax.random.split(key)
        filtered = _top_p_filter(last.astype(jnp.float32) / temperature, top_p)
        nxt = jax.random.categorical(sub, filtered, axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, 0, nxt)
        toks = toks.at[:, step].set(nxt)
        done = done | (nxt == stop_token)
        logits, cache = gpt2_forward(params, gcfg, tokens=nxt[:, None], cache=cache,
                                     policy=policy)
        return step + 1, toks, done, cache, logits[:, 0], key

    init = (jnp.zeros((), jnp.int32), jnp.zeros((b, max_steps), jnp.int32),
            jnp.zeros((b,), bool), cache, last, key)
    _, toks, done, _, _, _ = jax.lax.while_loop(cond, body, init)
    lengths = jnp.where(
        jnp.any(toks == stop_token, axis=-1),
        jnp.argmax(toks == stop_token, axis=-1) + 1, max_steps)
    return DecodeResult(tokens=toks, lengths=lengths, scores=jnp.zeros((b,)))


@functools.partial(jax.jit, static_argnames=("gcfg", "beam_size", "max_steps",
                                             "stop_token", "policy"))
def beam_decode(params, gcfg: GPT2Config, embeds, *, beam_size: int = 3,
                max_steps: int = 100, stop_token: int = 102,
                temperature: float = 0.5,
                policy: Policy = DEFAULT_POLICY) -> DecodeResult:
    """Batched beam search, beams folded into the batch dim, with a LAZY
    beam-ancestry cache: the KV cache is never physically reordered. Each beam
    writes its new k/v rows at its own (fixed) batch row; a tiny int32 ancestry
    map anc[b, beam, t] records which physical row holds beam's history at
    position t, and attention gathers through it at read time
    (models/gpt2._attn_over_cache). Round 2 reordered the full [L,B*beam,H,T,Dh]
    cache every step (a one-hot einsum, ~250 MB of extra HBM read+write at
    T~140) — lazy ancestry replaces that with a [B*beam, T] int32 carry update,
    leaving the unavoidable attention read as the only cache traffic.

    Returns beams sorted by normalized score (desc), matching reference
    generate_beam's output ordering (test.py:353-440).

    KNOWN BACKEND FAULT (round 4, bisected standalone): fp32 beam decode at
    B=16/beam=3/T=140 reproducibly crashes the TPU worker process ("kernel
    fault"); bf16 at the identical shape and fp32 at B=8 both pass, and the
    identical program is correct on CPU. Use a bf16 compute policy on TPU
    (policy_from_name("auto")); fp32 beam is for CPU parity runs."""
    b = embeds.shape[0]
    v = gcfg.vocab_size
    params = _precast(params, policy)
    last, cache = _prefill(params, gcfg, embeds, max_steps, policy)
    t_total = cache.k.shape[3]

    # step 0: top-k over the prompt's next-token distribution
    logp0 = jax.nn.log_softmax(last.astype(jnp.float32) / temperature, axis=-1)
    scores, nxt = jax.lax.top_k(logp0, beam_size)          # [B, beam] total logp
    # expand cache rows: each batch row repeated beam times -> [L, B*beam, H, T, Dh]
    cache = KVCache(k=jnp.repeat(cache.k, beam_size, axis=1),
                    v=jnp.repeat(cache.v, beam_size, axis=1),
                    length=cache.length)
    toks = jnp.zeros((b, beam_size, max_steps), jnp.int32).at[:, :, 0].set(nxt)
    seq_len = jnp.ones((b, beam_size), jnp.float32)
    stopped = nxt == stop_token

    # own[b, j] = global cache row of (batch b, beam j); prompt positions were
    # replicated per beam, so every beam's ancestry starts as its own row
    own = (jnp.arange(b)[:, None] * beam_size
           + jnp.arange(beam_size)[None, :]).astype(jnp.int32)
    anc = jnp.broadcast_to(own[..., None], (b, beam_size, t_total))

    stop_row = jnp.full((v,), NEG_INF).at[0].set(0.0)  # forced token 0, zero score

    def cond(s):
        step, *_, stopped, _, _ = s
        return (step < max_steps) & ~jnp.all(stopped)

    def body(s):
        step, toks, scores, seq_len, stopped, cache, anc = s
        # this step's k/v rows land at each beam's own row, position cache.length
        anc2 = jax.lax.dynamic_update_slice(anc, own[..., None], (0, 0, cache.length))
        flat_last = jax.lax.dynamic_slice_in_dim(toks, step - 1, 1, axis=2)  # [B,beam,1]
        logits, new_cache = gpt2_forward(params, gcfg,
                                         tokens=flat_last.reshape(b * beam_size, 1),
                                         cache=cache,
                                         cache_ancestry=anc2.reshape(b * beam_size, t_total),
                                         policy=policy)
        logp = jax.nn.log_softmax(
            logits[:, 0].astype(jnp.float32) / temperature, axis=-1
        ).reshape(b, beam_size, v)
        logp = jnp.where(stopped[..., None], stop_row, logp)
        scores_sum = scores[..., None] + logp                      # [B, beam, V]
        seq_len = seq_len + (~stopped).astype(jnp.float32)
        avg = scores_sum / seq_len[..., None]
        top_avg, idx = jax.lax.top_k(avg.reshape(b, beam_size * v), beam_size)
        src = idx // v                                             # [B, beam]
        tok = (idx % v).astype(jnp.int32)
        seq_len = jnp.take_along_axis(seq_len, src, axis=1)
        toks = jnp.take_along_axis(toks, src[..., None], axis=1)
        toks = jax.lax.dynamic_update_slice_in_dim(toks, tok[..., None], step, axis=2)
        scores = top_avg * seq_len
        stopped = jnp.take_along_axis(stopped, src, axis=1) | (tok == stop_token)
        # lazy reorder: new beam j' inherits ancestor src[j']'s full ancestry row
        anc2 = jnp.take_along_axis(anc2, src[..., None], axis=1)
        return step + 1, toks, scores, seq_len, stopped, new_cache, anc2

    init = (jnp.ones((), jnp.int32), toks, scores, seq_len, stopped, cache, anc)
    _, toks, scores, seq_len, stopped, _, _ = jax.lax.while_loop(cond, body, init)

    norm = scores / seq_len
    order = jnp.argsort(-norm, axis=1)
    return DecodeResult(
        tokens=jnp.take_along_axis(toks, order[..., None], axis=1),
        lengths=jnp.take_along_axis(seq_len, order, axis=1).astype(jnp.int32),
        scores=jnp.take_along_axis(norm, order, axis=1),
    )

"""T5 autoregressive decoding with the self+cross KV cache.

Reference generation: `self.t5.generate(inputs_embeds=..., do_sample=True,
max_length=32)` (reference CLIP_prefix_caption/test_t5.py:245-249) — ancestral
sampling from the decoder given the prefix-concatenated encoder states. Both sampling
and greedy are provided; T5 conventions: decoder_start = pad id 0, EOS id 1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from construction_clip_tpu.core.configs import T5Config
from construction_clip_tpu.core.precision import Policy, DEFAULT_POLICY
from construction_clip_tpu.infer.decode import DecodeResult, _top_p_filter
from construction_clip_tpu.models.t5 import t5_decode, t5_init_cache


@functools.partial(jax.jit, static_argnames=("tcfg", "max_steps", "eos_id",
                                             "start_id", "do_sample", "top_p",
                                             "temperature", "policy"))
def t5_generate(params, tcfg: T5Config, encoder_hidden, *, key=None,
                encoder_mask=None, max_steps: int = 32, eos_id: int = 1,
                start_id: int = 0, do_sample: bool = True, top_p: float = 1.0,
                temperature: float = 1.0,
                policy: Policy = DEFAULT_POLICY) -> DecodeResult:
    b = encoder_hidden.shape[0]
    # Pre-cast ONCE so the per-step cast_to_compute inside the while_loop body
    # is a dtype-identity no-op XLA folds away. Without this the loop re-casts
    # the 250112x512 shared table + lm_head (~1 GB fp32 read + bf16 write)
    # every step — measured 2.6x over the dispatch floor at B=1.
    from construction_clip_tpu.models.t5 import _cast_params, prepare_decode_head
    from construction_clip_tpu.ops.pallas_vocab_head import MAX_ROWS
    params = _cast_params(params, policy)
    if b <= MAX_ROWS:
        # pad the LM head for the streaming decode kernel ONLY when the
        # small-B kernel path is live: at larger B the head runs as the
        # plain XLA GEMM, and padding it measured a B=32 regression
        # (43.3k -> 36.4k tok/s) for zero benefit
        params = prepare_decode_head(params, tcfg)
    cache = t5_init_cache(params, tcfg, encoder_hidden, max_len=max_steps + 1,
                          policy=policy)
    logits, cache = t5_decode(params, tcfg, jnp.full((b, 1), start_id, jnp.int32),
                              encoder_hidden, encoder_mask=encoder_mask, cache=cache,
                              policy=policy)
    if key is None:
        key = jax.random.key(0)

    def cond(s):
        step, _, done, _, _, _ = s
        return (step < max_steps) & ~jnp.all(done)

    def body(s):
        step, toks, done, cache, last, key = s
        logits32 = last.astype(jnp.float32) / temperature
        if do_sample:
            key, sub = jax.random.split(key)
            if top_p < 1.0:
                logits32 = _top_p_filter(logits32, top_p)
            nxt = jax.random.categorical(sub, logits32, axis=-1).astype(jnp.int32)
        else:
            nxt = jnp.argmax(logits32, axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, 0, nxt)
        toks = toks.at[:, step].set(nxt)
        done = done | (nxt == eos_id)
        logits, cache = t5_decode(params, tcfg, nxt[:, None], encoder_hidden,
                                  encoder_mask=encoder_mask, cache=cache,
                                  policy=policy)
        return step + 1, toks, done, cache, logits[:, 0], key

    init = (jnp.zeros((), jnp.int32), jnp.zeros((b, max_steps), jnp.int32),
            jnp.zeros((b,), bool), cache, logits[:, 0], key)
    _, toks, done, _, _, _ = jax.lax.while_loop(cond, body, init)
    lengths = jnp.where(jnp.any(toks == eos_id, axis=-1),
                        jnp.argmax(toks == eos_id, axis=-1) + 1, max_steps)
    return DecodeResult(tokens=toks, lengths=lengths, scores=jnp.zeros((b,)))

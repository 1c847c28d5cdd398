#!/usr/bin/env python
"""On-chip bisection, part 3: WHERE does bf16 beam-3 go wrong?

Known (tools/diag_beam_bf16.py, /tmp/diag7.log): beam1 correct; one manual
step-1 with ancestry at B*beam=24 rows correct; beam3 garbage even with a
one-hot ancestry gather -> the per-op suspects are all exonerated; the
while_loop compilation of the beam body at 24 rows is the remaining suspect
(family resemblance: fp32 beam at B=16/48 rows KILLS the worker outright).

Probes, each printing raw tokens for rows 0 and 4:
  A. beam3 bf16, max_steps=12 — what tokens, from which step?
  B. beam3 bf16 at B=2 (6 rows) — row-count dependence
  C. beam3 bf16 with the loop as lax.scan over a fixed 40 steps (no early
     exit, same body) — lowering dependence
  D. beam3 bf16 EAGER: the same body chained step-by-step in python with a
     per-step jit — if this is correct, the fused loop program is the fault

Run: cd /root/repo && nohup python -u tools/diag_beam_loop.py > /tmp/diag8.log 2>&1 &
"""
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/apps")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/cctpu_xla"))

import jax
import jax.numpy as jnp

from construction_clip_tpu.core.configs import ClipCapConfig, GPT2Config
from construction_clip_tpu.core.precision import BF16_POLICY
from construction_clip_tpu.infer.decode import NEG_INF, _precast, _prefill, beam_decode
from construction_clip_tpu.infer.precompute import (load_archive,
                                                    tokenize_for_caption_training)
from construction_clip_tpu.models import gpt2 as gpt2_lib
from construction_clip_tpu.models.gpt2 import KVCache, gpt2_forward
from construction_clip_tpu.models.clipcap import init_clipcap, map_prefix
from construction_clip_tpu.train.checkpoint import load_params_npz
from common import load_hf_tokenizer

N = 8
print("backend:", jax.default_backend(), flush=True)
arch = load_archive("runs/e2e/embedding.npz")
tok = load_hf_tokenizer("runs/e2e/assets/bert_zh_vocab")
ccfg = ClipCapConfig(clip_dim=512)
gcfg = GPT2Config()
params = load_params_npz("runs/e2e/models/clipcap.npz",
                         init_clipcap(jax.random.key(0), ccfg, gcfg))
data = tokenize_for_caption_training(arch, tok, attribute_length=ccfg.attribute_length)
pol = BF16_POLICY
pre = map_prefix(params["mapper"], ccfg, gcfg, jnp.asarray(data["prefix"][:N]),
                 policy=pol)
ae = gpt2_lib.embed_tokens(params["gpt"], jnp.asarray(data["attribute"][:N]),
                           policy=pol)
prompt = jnp.concatenate([pre.astype(ae.dtype), ae], axis=1)
p = _precast(params["gpt"], pol)


def show(tag, r):
    t = np.asarray(r.tokens)
    l = np.asarray(r.lengths)
    print(f"{tag}: lens={l[:, 0].tolist()}", flush=True)
    for i in (0, 4):
        if i < t.shape[0]:
            print(f"  row{i} beam0 toks: {t[i, 0][:16].tolist()}", flush=True)


# A: short beam3
r = beam_decode(params["gpt"], gcfg, prompt, beam_size=3, max_steps=12,
                stop_token=102, temperature=0.5, policy=pol)
show("A beam3/steps12", r)

# B: B=2
r = beam_decode(params["gpt"], gcfg, prompt[:2], beam_size=3, max_steps=100,
                stop_token=102, temperature=0.5, policy=pol)
show("B beam3/B2", r)


# C/D: beam body replicated with pluggable loop mode
def beam_manual(params_gpt, embeds, *, beam_size=3, max_steps=40,
                stop_token=102, temperature=0.5, mode="scan"):
    b = embeds.shape[0]
    v = gcfg.vocab_size
    pp = _precast(params_gpt, pol)

    @jax.jit
    def init(pp, embeds):
        last, cache = _prefill(pp, gcfg, embeds, max_steps, pol)
        t_total = cache.k.shape[3]
        logp0 = jax.nn.log_softmax(last.astype(jnp.float32) / temperature, -1)
        scores, nxt = jax.lax.top_k(logp0, beam_size)
        cache = KVCache(k=jnp.repeat(cache.k, beam_size, axis=1),
                        v=jnp.repeat(cache.v, beam_size, axis=1),
                        length=cache.length)
        toks = jnp.zeros((b, beam_size, max_steps), jnp.int32).at[:, :, 0].set(nxt)
        seq_len = jnp.ones((b, beam_size), jnp.float32)
        stopped = nxt == stop_token
        own = (jnp.arange(b)[:, None] * beam_size
               + jnp.arange(beam_size)[None, :]).astype(jnp.int32)
        anc = jnp.broadcast_to(own[..., None], (b, beam_size, t_total))
        return toks, scores, seq_len, stopped, cache, anc, own

    toks, scores, seq_len, stopped, cache, anc, own = init(pp, embeds)
    t_total = cache.k.shape[3]
    stop_row = jnp.full((v,), NEG_INF).at[0].set(0.0)

    def body(s, _):
        step, toks, scores, seq_len, stopped, cache, anc = s
        anc2 = jax.lax.dynamic_update_slice(anc, own[..., None],
                                            (0, 0, cache.length))
        flat_last = jax.lax.dynamic_slice_in_dim(toks, step - 1, 1, axis=2)
        logits, new_cache = gpt2_forward(
            pp, gcfg, tokens=flat_last.reshape(b * beam_size, 1), cache=cache,
            cache_ancestry=anc2.reshape(b * beam_size, t_total), policy=pol)
        logp = jax.nn.log_softmax(
            logits[:, 0].astype(jnp.float32) / temperature, -1
        ).reshape(b, beam_size, v)
        logp = jnp.where(stopped[..., None], stop_row, logp)
        scores_sum = scores[..., None] + logp
        seq_len = seq_len + (~stopped).astype(jnp.float32)
        avg = scores_sum / seq_len[..., None]
        top_avg, idx = jax.lax.top_k(avg.reshape(b, beam_size * v), beam_size)
        src = idx // v
        tokn = (idx % v).astype(jnp.int32)
        seq_len = jnp.take_along_axis(seq_len, src, axis=1)
        toks = jnp.take_along_axis(toks, src[..., None], axis=1)
        toks = jax.lax.dynamic_update_slice_in_dim(toks, tokn[..., None], step,
                                                   axis=2)
        scores = top_avg * seq_len
        stopped = jnp.take_along_axis(stopped, src, axis=1) | (tokn == stop_token)
        anc2 = jnp.take_along_axis(anc2, src[..., None], axis=1)
        return (step + 1, toks, scores, seq_len, stopped, new_cache, anc2), None

    state = (jnp.ones((), jnp.int32), toks, scores, seq_len, stopped, cache, anc)
    if mode == "scan":
        @jax.jit
        def run(state):
            out, _ = jax.lax.scan(body, state, None, length=max_steps - 1)
            return out
        state = run(state)
    else:  # eager: one jitted step, called from python
        step_fn = jax.jit(lambda s: body(s, None)[0])
        for _ in range(max_steps - 1):
            state = step_fn(state)
    _, toks, scores, seq_len, stopped, _, _ = state
    return toks, seq_len


for mode in ("scan", "eager"):
    toks, seq_len = beam_manual(params["gpt"], prompt, mode=mode)
    t = np.asarray(toks)
    l = np.asarray(seq_len)
    print(f"{mode}: lens={l[:, 0].tolist()}", flush=True)
    for i in (0, 4):
        print(f"  row{i} beam0 toks: {t[i, 0][:16].tolist()}", flush=True)

print("DIAG8_DONE", flush=True)

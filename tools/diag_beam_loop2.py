#!/usr/bin/env python
"""On-chip bisection, part 4: beam3 bf16 at the FAILING size (B=8, steps=100,
T_max=147), loop lowering varied. Known from parts 2-3: correct at
(B=8, steps=12), (B=2, steps=100), beam1 (8 rows), one-hot gather changes
nothing -> 24 rows x 147-window while_loop is the failing combination.

  W  beam_decode (while_loop) B=8 steps=100  — reproduce in this process
  C  same body as lax.scan over 99 steps     — lowering dependence
  D  same body, one jitted step chained from python (eager) — if correct,
     the monolithic loop program is the fault and this is the workaround bound

Run: cd /root/repo && nohup python -u tools/diag_beam_loop2.py > /tmp/diag9.log 2>&1 &
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
BEAM = 3
STEPS = 100
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
# jnp-ify once: numpy leaves indexed with tracers break outside full jit
pp = jax.tree.map(jnp.asarray, _precast(params["gpt"], pol))


def show(tag, toks, lens):
    t, l = np.asarray(toks), np.asarray(lens)
    print(f"{tag}: lens={l[:, 0].astype(int).tolist()}", flush=True)
    for i in (0, 4):
        print(f"  row{i} beam0 toks: {t[i, 0][:12].tolist()}", flush=True)


# W: the production while_loop at the failing size
r = beam_decode(params["gpt"], gcfg, prompt, beam_size=BEAM, max_steps=STEPS,
                stop_token=102, temperature=0.5, policy=pol)
show("W while100", r.tokens, r.lengths)

b = N
v = gcfg.vocab_size


@jax.jit
def init(pp, embeds):
    last, cache = _prefill(pp, gcfg, embeds, STEPS, pol)
    t_total = cache.k.shape[3]
    logp0 = jax.nn.log_softmax(last.astype(jnp.float32) / 0.5, -1)
    scores, nxt = jax.lax.top_k(logp0, BEAM)
    cache = KVCache(k=jnp.repeat(cache.k, BEAM, axis=1),
                    v=jnp.repeat(cache.v, BEAM, axis=1), length=cache.length)
    toks = jnp.zeros((b, BEAM, STEPS), jnp.int32).at[:, :, 0].set(nxt)
    seq_len = jnp.ones((b, BEAM), jnp.float32)
    stopped = nxt == 102
    own = (jnp.arange(b)[:, None] * BEAM
           + jnp.arange(BEAM)[None, :]).astype(jnp.int32)
    anc = jnp.broadcast_to(own[..., None], (b, BEAM, t_total))
    return toks, scores, seq_len, stopped, cache, anc, own


def body(pp, own, s):
    step, toks, scores, seq_len, stopped, cache, anc = s
    t_total = anc.shape[-1]
    stop_row = jnp.full((v,), NEG_INF).at[0].set(0.0)
    anc2 = jax.lax.dynamic_update_slice(anc, own[..., None],
                                        (0, 0, cache.length))
    flat_last = jax.lax.dynamic_slice_in_dim(toks, step - 1, 1, axis=2)
    logits, new_cache = gpt2_forward(
        pp, gcfg, tokens=flat_last.reshape(b * BEAM, 1), cache=cache,
        cache_ancestry=anc2.reshape(b * BEAM, t_total), policy=pol)
    logp = jax.nn.log_softmax(
        logits[:, 0].astype(jnp.float32) / 0.5, -1).reshape(b, BEAM, v)
    logp = jnp.where(stopped[..., None], stop_row, logp)
    scores_sum = scores[..., None] + logp
    seq_len = seq_len + (~stopped).astype(jnp.float32)
    avg = scores_sum / seq_len[..., None]
    top_avg, idx = jax.lax.top_k(avg.reshape(b, BEAM * v), BEAM)
    src = idx // v
    tokn = (idx % v).astype(jnp.int32)
    seq_len = jnp.take_along_axis(seq_len, src, axis=1)
    toks = jnp.take_along_axis(toks, src[..., None], axis=1)
    toks = jax.lax.dynamic_update_slice_in_dim(toks, tokn[..., None], step,
                                               axis=2)
    scores = top_avg * seq_len
    stopped = jnp.take_along_axis(stopped, src, axis=1) | (tokn == 102)
    anc2 = jnp.take_along_axis(anc2, src[..., None], axis=1)
    return (step + 1, toks, scores, seq_len, stopped, new_cache, anc2)


@jax.jit
def run_scan(pp, embeds):
    toks, scores, seq_len, stopped, cache, anc, own = init(pp, embeds)
    state = (jnp.ones((), jnp.int32), toks, scores, seq_len, stopped, cache, anc)
    out, _ = jax.lax.scan(lambda s, _: (body(pp, own, s), None), state, None,
                          length=STEPS - 1)
    return out[1], out[3]


toks, seq_len = run_scan(pp, prompt)
show("C scan100", toks, seq_len)

# D: eager chain of one jitted step
step_fn = jax.jit(lambda pp, own, s: body(pp, own, s))
toks, scores, seq_len, stopped, cache, anc, own = init(pp, prompt)
state = (jnp.ones((), jnp.int32), toks, scores, seq_len, stopped, cache, anc)
for k in range(STEPS - 1):
    state = step_fn(pp, own, state)
    if k == 0:
        print("  eager step1 done", flush=True)
show("D eager100", state[1], state[3])
print("DIAG9_DONE", flush=True)

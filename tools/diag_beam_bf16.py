#!/usr/bin/env python
"""On-chip bisection of the bf16 BEAM decode fault (round 4, after the prefill
fix): greedy bf16 is now token-exact vs fp32, but beam-3 bf16 still emits
token 0 every step (tools/diag_prefill_fix.py, /tmp/diag6.log). Beam differs
from greedy by: cache rows repeat()ed per beam, the lazy ancestry gather in
_attn_over_cache's t==1 branch, and fp32 bookkeeping (CPU-verified). This
script isolates, at B=8 from the npz-built prompt:

  1. beam_size=1 bf16 (ancestry == identity on an un-repeated cache)
  2. one manual decode step: prefill -> repeat(3) -> gpt2_forward t==1 with
     ancestry=own vs ancestry=None — identity gather MUST be a no-op
  3. beam-3 bf16 with the ancestry gather done through a ONE-HOT MATMUL
     (monkeypatched _attn_over_cache) instead of take_along_axis

Run: cd /root/repo && nohup python -u tools/diag_beam_bf16.py > /tmp/diag7.log 2>&1 &
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
from construction_clip_tpu.infer.decode import _precast, _prefill, beam_decode
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


def decode_text(t, l):
    ids = [int(v) for v in t[: int(l)] if int(v) != 102]
    return tok.decode(ids, skip_special_tokens=True).replace(" ", "")


def show(tag, r, beams=True):
    t = np.asarray(r.tokens)[:, 0] if beams else np.asarray(r.tokens)
    l = np.asarray(r.lengths)[:, 0] if beams else np.asarray(r.lengths)
    print(f"{tag}: lens={l.tolist()}", flush=True)
    print(f"  caps={[decode_text(t[i], l[i]) for i in range(N)]}", flush=True)


# 1: beam_size=1 bf16 — identity ancestry, no repeat fan-out
r = beam_decode(params["gpt"], gcfg, prompt, beam_size=1, max_steps=100,
                stop_token=102, temperature=0.5, policy=pol)
show("beam1/bf16", r)

# 2: manual step-1, ancestry=own (identity) vs None on the repeat(3)ed cache
BEAM = 3


@jax.jit
def step1(p, x):
    last, cache = _prefill(p, gcfg, x, 100, pol)
    t_total = cache.k.shape[3]
    cache = KVCache(k=jnp.repeat(cache.k, BEAM, axis=1),
                    v=jnp.repeat(cache.v, BEAM, axis=1), length=cache.length)
    logp0 = jax.nn.log_softmax(last.astype(jnp.float32) / 0.5, axis=-1)
    _, nxt = jax.lax.top_k(logp0, BEAM)                       # [B, beam]
    own = (jnp.arange(N)[:, None] * BEAM
           + jnp.arange(BEAM)[None, :]).astype(jnp.int32)
    anc = jnp.broadcast_to(own[..., None], (N, BEAM, t_total))
    anc = jax.lax.dynamic_update_slice(anc, own[..., None], (0, 0, cache.length))
    toks = nxt.reshape(N * BEAM, 1)
    lg_anc, _ = gpt2_forward(p, gcfg, tokens=toks, cache=cache,
                             cache_ancestry=anc.reshape(N * BEAM, t_total),
                             policy=pol)
    lg_none, _ = gpt2_forward(p, gcfg, tokens=toks, cache=cache, policy=pol)
    return lg_anc[:, 0], lg_none[:, 0]


la, ln = step1(p, prompt)
la32, ln32 = np.asarray(la, np.float32), np.asarray(ln, np.float32)
print("step1 ancestry-vs-none max|diff|:", float(np.abs(la32 - ln32).max()),
      flush=True)
print("  argmax anc :", la32.argmax(-1).tolist(), flush=True)
print("  argmax none:", ln32.argmax(-1).tolist(), flush=True)

# 3: beam-3 bf16 with a one-hot-matmul ancestry gather
_orig = gpt2_lib._attn_over_cache


def _attn_onehot(q, ck, cv, cache_len, attn_bias, ancestry=None):
    if q.shape[2] == 1 and ancestry is not None:
        rows = ck.shape[0]
        oh = jax.nn.one_hot(ancestry, rows, dtype=jnp.float32)   # [B, T, rows]
        ck = jnp.einsum("btr,rhtd->bhtd", oh, ck.astype(jnp.float32))
        cv = jnp.einsum("btr,rhtd->bhtd", oh, cv.astype(jnp.float32))
        return _orig(q, ck, cv, cache_len, attn_bias, None)
    return _orig(q, ck, cv, cache_len, attn_bias, ancestry)


gpt2_lib._attn_over_cache = _attn_onehot
jax.clear_caches()
try:
    r = beam_decode(params["gpt"], gcfg, prompt, beam_size=3, max_steps=100,
                    stop_token=102, temperature=0.5, policy=pol)
    show("beam3/bf16/onehot-gather", r)
finally:
    gpt2_lib._attn_over_cache = _orig
    jax.clear_caches()
print("DIAG7_DONE", flush=True)

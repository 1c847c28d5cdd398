#!/usr/bin/env python
"""On-chip A/B over the TPU beam-decode fault (round 4).

State going in (tools/diag_prefill_fix.py, /tmp/diag6.log, /tmp/diag7.log):
after the prefill fix, bf16 greedy B=8 is token-exact vs fp32 with real
captions, beam-1 works, B=2 beam-3 (6 rows) works at 100 steps, and the
step-1 program at 24 rows is clean — but bf16 beam-3 at B=8 (24 rows x 147
cache window) decodes token 0 on every row for 100 steps (empty captions,
the runs/e2e artifact bug). One-hot (einsum) ancestry also fails, so the
take_along_axis gather is exonerated.

Variants probed here, cheapest first:
  A  baseline beam3 B=8 bf16       (reconfirm the fault this session)
  B  greedy at B=24, 147-window    (pure forward at the failing shape —
                                    separates forward-shape fault from
                                    beam bookkeeping)
  C  beam3 with dot_general t==1 attention (einsum) instead of the
     broadcast-multiply-reduce VPU path
  D  beam3 with -1e9 masks instead of finfo.min (NEG_INF+NEG_INF = -inf
     in the logits+bias sum is legal fp32 but a plausible Mosaic edge)
  E  chunked: 2x beam3 B=4 (12 rows) — the product workaround if C/D fail

Run: cd /root/repo && nohup python -u tools/diag_beam_variants.py > /tmp/diag11.log 2>&1 &
"""
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/apps")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/cctpu_xla"))

import jax
import jax.numpy as jnp

from construction_clip_tpu.core.configs import ClipCapConfig, GPT2Config
from construction_clip_tpu.core.precision import BF16_POLICY
from construction_clip_tpu.infer import decode as dec
from construction_clip_tpu.infer.decode import beam_decode, greedy_decode
from construction_clip_tpu.infer.precompute import (load_archive,
                                                    tokenize_for_caption_training)
from construction_clip_tpu.models import gpt2 as gpt2_lib
from construction_clip_tpu.models.clipcap import init_clipcap, map_prefix
from construction_clip_tpu.train.checkpoint import load_params_npz
from common import load_hf_tokenizer

N = 8
print("backend:", jax.default_backend(), flush=True)


def smoke(tries=20):
    for i in range(tries):
        try:
            v = float(jax.jit(lambda x: (x @ x).sum())(jnp.ones((128, 128))))
            print(f"  smoke ok ({v:.0f})", flush=True)
            return True
        except Exception as e:  # noqa: BLE001
            print(f"  smoke fail {i}: {type(e).__name__}", flush=True)
            time.sleep(60)
    return False


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


def decode_text(t, l):
    ids = [int(v) for v in t[: int(l)] if int(v) != 102]
    return tok.decode(ids, skip_special_tokens=True).replace(" ", "")


def report(tag, r, beam=True):
    if beam:
        t, l = np.asarray(r.tokens)[:, 0], np.asarray(r.lengths)[:, 0]
    else:
        t, l = np.asarray(r.tokens), np.asarray(r.lengths)
    caps = [decode_text(t[i], l[i]) for i in range(t.shape[0])]
    nonempty = sum(1 for c in caps if c)
    print(f"{tag}: lens={l.tolist()} nonempty={nonempty}/{len(caps)}", flush=True)
    print(f"  caps={caps[:8]}", flush=True)
    return nonempty


orig_attn = gpt2_lib._attn_over_cache


def attn_einsum(q, ck, cv, cache_len, attn_bias, ancestry=None):
    """t==1 via dot_general (einsum) instead of broadcast-multiply-reduce."""
    t_new = q.shape[2]
    if t_new != 1:
        return orig_attn(q, ck, cv, cache_len, attn_bias, ancestry)
    if ancestry is not None:
        idx = ancestry[:, None, :, None]
        ck = jnp.take_along_axis(ck, idx, axis=0)
        cv = jnp.take_along_axis(cv, idx, axis=0)
    qf = q[:, :, 0, :].astype(jnp.float32) * (q.shape[-1] ** -0.5)
    logits = jnp.einsum("bhd,bhtd->bht", qf, ck.astype(jnp.float32),
                        preferred_element_type=jnp.float32)
    k_pos = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 2)
    logits = jnp.where(k_pos <= cache_len, logits, jnp.finfo(jnp.float32).min)
    if attn_bias is not None:
        b32 = attn_bias.astype(jnp.float32)
        if b32.ndim >= 2:
            b32 = b32[..., 0, :]
        logits = logits + b32
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bht,bhtd->bhd", probs, cv.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    return out[:, :, None, :].astype(q.dtype)


def attn_mask9(q, ck, cv, cache_len, attn_bias, ancestry=None):
    """t==1 multiply-reduce path but with -1e9 masking (no -inf sums)."""
    t_new = q.shape[2]
    if t_new != 1:
        return orig_attn(q, ck, cv, cache_len, attn_bias, ancestry)
    if ancestry is not None:
        idx = ancestry[:, None, :, None]
        ck = jnp.take_along_axis(ck, idx, axis=0)
        cv = jnp.take_along_axis(cv, idx, axis=0)
    qf = q[:, :, 0, :].astype(jnp.float32) * (q.shape[-1] ** -0.5)
    logits = jnp.sum(qf[:, :, None, :] * ck.astype(jnp.float32), axis=-1)
    k_pos = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 2)
    logits = jnp.where(k_pos <= cache_len, logits, -1e9)
    if attn_bias is not None:
        b32 = jnp.maximum(attn_bias.astype(jnp.float32), -1e9)
        if b32.ndim >= 2:
            b32 = b32[..., 0, :]
        logits = logits + b32
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.sum(probs[..., None] * cv.astype(jnp.float32), axis=2)
    return out[:, :, None, :].astype(q.dtype)


smoke()

# A: baseline (reconfirm)
t0 = time.time()
r = beam_decode(params["gpt"], gcfg, prompt, beam_size=3, max_steps=100,
                stop_token=102, temperature=0.5, policy=pol)
ok_a = report("A/baseline-beam3-B8", r)
print(f"  ({time.time()-t0:.0f}s)", flush=True)
smoke()

# B: greedy at 24 rows, 147 window (pure forward at the failing shape)
t0 = time.time()
p24 = jnp.tile(prompt, (3, 1, 1))
r = greedy_decode(params["gpt"], gcfg, p24, max_steps=100, stop_token=102,
                  policy=pol)
ok_b = report("B/greedy-B24-T147", r, beam=False)
print(f"  ({time.time()-t0:.0f}s)", flush=True)
smoke()

# C: einsum t==1 attention
gpt2_lib._attn_over_cache = attn_einsum
jax.clear_caches()
t0 = time.time()
r = beam_decode(params["gpt"], gcfg, prompt, beam_size=3, max_steps=100,
                stop_token=102, temperature=0.5, policy=pol)
ok_c = report("C/beam3-B8-einsum-attn", r)
print(f"  ({time.time()-t0:.0f}s)", flush=True)
smoke()

# D: -1e9 mask
gpt2_lib._attn_over_cache = attn_mask9
jax.clear_caches()
t0 = time.time()
r = beam_decode(params["gpt"], gcfg, prompt, beam_size=3, max_steps=100,
                stop_token=102, temperature=0.5, policy=pol)
ok_d = report("D/beam3-B8-mask1e9", r)
print(f"  ({time.time()-t0:.0f}s)", flush=True)
smoke()

# E: chunked 2x B=4 (12 rows)
gpt2_lib._attn_over_cache = orig_attn
jax.clear_caches()
t0 = time.time()
tot = 0
for c in range(2):
    r = beam_decode(params["gpt"], gcfg, prompt[4 * c:4 * (c + 1)], beam_size=3,
                    max_steps=100, stop_token=102, temperature=0.5, policy=pol)
    tot += report(f"E/beam3-B4-chunk{c}", r)
print(f"  ({time.time()-t0:.0f}s)", flush=True)

print(json.dumps({"A_baseline": ok_a, "B_greedy24": ok_b, "C_einsum": ok_c,
                  "D_mask1e9": ok_d, "E_chunked": tot}), flush=True)
print("DIAG11_DONE", flush=True)

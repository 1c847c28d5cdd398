#!/usr/bin/env python
"""On-chip probe: is the materialized repeat()ed KV cache the beam-fault root?

Evidence so far (diag7/8/9/11 logs): beam-3 at 24 rows x 147 window emits
token 0 from step 1 in while_loop, scan, AND eager-chain form — but the
IDENTICAL step-1 computation fused into one jit with the prefill+repeat is
clean. The three failing forms all materialize the repeated
[12,24,12,147,64] bf16 cache as a real buffer (loop carry / jit output); the
clean form lets XLA fuse the repeat into the attention read. B=2 (6 rows,
16 MB) and 59-window (26 MB) materializations work; 24x147 (65 MB x2) fails.

Probes:
  F. checksum across the boundary: one jit returns (cache, in-jit checksums
     of k/v); a second jit recomputes the checksums from the boundary-crossed
     cache. Mismatch == materialization corrupts the buffer.
     Done for the unrepeated [8-row] prefill cache AND the repeated 24-row one.
  G. beam3 B=8 with a TILED-PROMPT prefill: embeds tiled to [B*beam, t0, D]
     BEFORE prefill so the cache is born at 24 rows and jnp.repeat never runs
     (3x redundant prefill FLOPs over 47 tokens — negligible vs 100 steps).
     If G produces real captions, this is the product fix.

Run: cd /root/repo && nohup python -u tools/diag_beam_repeat.py > /tmp/diag12.log 2>&1 &
"""
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
from construction_clip_tpu.infer.decode import NEG_INF, _precast, _prefill
from construction_clip_tpu.infer.precompute import (load_archive,
                                                    tokenize_for_caption_training)
from construction_clip_tpu.models import gpt2 as gpt2_lib
from construction_clip_tpu.models.gpt2 import KVCache, gpt2_forward
from construction_clip_tpu.models.clipcap import init_clipcap, map_prefix
from construction_clip_tpu.train.checkpoint import load_params_npz
from common import load_hf_tokenizer

N = 8
BEAM = 3
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


def cksum(x):
    xf = x.astype(jnp.float32)
    return jnp.stack([jnp.sum(jnp.abs(xf)), jnp.sum(xf * xf),
                      jnp.sum(jnp.isnan(xf).astype(jnp.float32))])


# ---- F: boundary checksum --------------------------------------------------
@jax.jit
def init_plain(p, x):
    last, cache = _prefill(p, gcfg, x, 100, pol)
    return cache, cksum(cache.k), cksum(cache.v)


@jax.jit
def init_repeat(p, x):
    last, cache = _prefill(p, gcfg, x, 100, pol)
    cache = KVCache(k=jnp.repeat(cache.k, BEAM, axis=1),
                    v=jnp.repeat(cache.v, BEAM, axis=1), length=cache.length)
    return cache, cksum(cache.k), cksum(cache.v)


@jax.jit
def recheck(cache):
    return cksum(cache.k), cksum(cache.v)


for tag, fn in (("plain8", init_plain), ("repeat24", init_repeat)):
    cache, k_in, v_in = fn(p, prompt)
    k_out, v_out = recheck(cache)
    k_in, v_in, k_out, v_out = (np.asarray(z) for z in (k_in, v_in, k_out, v_out))
    print(f"F/{tag}: k in-jit {k_in.tolist()}", flush=True)
    print(f"F/{tag}: k boundary {k_out.tolist()}  match={np.allclose(k_in, k_out, rtol=1e-5)}",
          flush=True)
    print(f"F/{tag}: v in-jit {v_in.tolist()}", flush=True)
    print(f"F/{tag}: v boundary {v_out.tolist()}  match={np.allclose(v_in, v_out, rtol=1e-5)}",
          flush=True)


# ---- G: tiled-prompt prefill beam (no jnp.repeat) ---------------------------
def beam_tiled(params_gpt, embeds, *, beam_size=BEAM, max_steps=100,
               stop_token=102, temperature=0.5):
    """beam_decode with the cache born at B*beam rows: prompt tiled before
    prefill, step-0 top-k taken from the (beam-identical) prefill logits."""
    b = embeds.shape[0]
    v = gcfg.vocab_size
    pp = _precast(params_gpt, pol)

    @jax.jit
    def run(pp, embeds):
        tiled = jnp.repeat(embeds, beam_size, axis=0)  # [B*beam, t0, D] small
        last, cache = _prefill(pp, gcfg, tiled, max_steps, pol)
        t_total = cache.k.shape[3]
        # step-0 logits: every beam row of a batch is identical; use row j*beam
        last_b = last.reshape(b, beam_size, -1)[:, 0]
        logp0 = jax.nn.log_softmax(last_b.astype(jnp.float32) / temperature, -1)
        scores, nxt = jax.lax.top_k(logp0, beam_size)
        toks = jnp.zeros((b, beam_size, max_steps), jnp.int32).at[:, :, 0].set(nxt)
        seq_len = jnp.ones((b, beam_size), jnp.float32)
        stopped = nxt == stop_token
        own = (jnp.arange(b)[:, None] * beam_size
               + jnp.arange(beam_size)[None, :]).astype(jnp.int32)
        anc = jnp.broadcast_to(own[..., None], (b, beam_size, t_total))
        stop_row = jnp.full((v,), NEG_INF).at[0].set(0.0)

        def cond(s):
            step, *_, stopped, _, _ = s
            return (step < max_steps) & ~jnp.all(stopped)

        def body(s):
            step, toks, scores, seq_len, stopped, cache, anc = s
            anc2 = jax.lax.dynamic_update_slice(anc, own[..., None],
                                                (0, 0, cache.length))
            flat_last = jax.lax.dynamic_slice_in_dim(toks, step - 1, 1, axis=2)
            logits, new_cache = gpt2_forward(
                pp, gcfg, tokens=flat_last.reshape(b * beam_size, 1),
                cache=cache, cache_ancestry=anc2.reshape(b * beam_size, t_total),
                policy=pol)
            logp = jax.nn.log_softmax(
                logits[:, 0].astype(jnp.float32) / temperature, -1
            ).reshape(b, beam_size, v)
            logp = jnp.where(stopped[..., None], stop_row, logp)
            scores_sum = scores[..., None] + logp
            seq_len = seq_len + (~stopped).astype(jnp.float32)
            avg = scores_sum / seq_len[..., None]
            top_avg, idx = jax.lax.top_k(avg.reshape(b, beam_size * v), beam_size)
            src = idx // v
            tok_ = (idx % v).astype(jnp.int32)
            seq_len = jnp.take_along_axis(seq_len, src, axis=1)
            toks = jnp.take_along_axis(toks, src[..., None], axis=1)
            toks = jax.lax.dynamic_update_slice_in_dim(toks, tok_[..., None],
                                                       step, axis=2)
            scores = top_avg * seq_len
            stopped = jnp.take_along_axis(stopped, src, axis=1) | (tok_ == stop_token)
            anc2 = jnp.take_along_axis(anc2, src[..., None], axis=1)
            return step + 1, toks, scores, seq_len, stopped, new_cache, anc2

        init = (jnp.ones((), jnp.int32), toks, scores, seq_len, stopped, cache, anc)
        _, toks, scores, seq_len, stopped, _, _ = jax.lax.while_loop(cond, body, init)
        return toks, seq_len

    return run(pp, embeds)


def decode_text(t, l):
    ids = [int(z) for z in t[: int(l)] if int(z) != 102]
    return tok.decode(ids, skip_special_tokens=True).replace(" ", "")


t0 = time.time()
toks, seq_len = beam_tiled(params["gpt"], prompt)
t_np, l_np = np.asarray(toks)[:, 0], np.asarray(seq_len)[:, 0]
caps = [decode_text(t_np[i], l_np[i]) for i in range(N)]
nonempty = sum(1 for c in caps if c)
print(f"G/beam3-tiled-prefill: lens={l_np.astype(int).tolist()} "
      f"nonempty={nonempty}/{N} ({time.time()-t0:.0f}s)", flush=True)
print(f"  caps={caps}", flush=True)
print("DIAG12_DONE", flush=True)

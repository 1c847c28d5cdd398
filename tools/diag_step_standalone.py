#!/usr/bin/env python
"""On-chip bisection, part 5: minimal standalone repro hunt for the bf16 beam
fault. Eager per-step chaining fails at (24 rows, T_max=147) while the same
step FUSED behind prefill in one jit is correct (diag7 vs diag9) — so the
fault is program-boundary/fusion dependent. This sweeps:

  1. _attn_over_cache t==1 standalone vs numpy:
     rows x t_max x {no-anc, identity-anc, shuffled-anc} x {bf16, fp32}
  2. ONE gpt2_forward t==1 step standalone (cache as a jit argument, like the
     eager chain) at rows=24, t_max in {59, 147}: bf16 logits vs fp32 logits
     (fp32 single-step is trusted: fp32 greedy is chip-correct) + a
     uniformity probe (max-min of the logits row — all-equal rows are the
     empty-caption signature).

Run: cd /root/repo && nohup python -u tools/diag_step_standalone.py > /tmp/diag10.log 2>&1 &
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
from construction_clip_tpu.core.precision import BF16_POLICY, DEFAULT_POLICY
from construction_clip_tpu.infer.decode import _precast, _prefill
from construction_clip_tpu.infer.precompute import (load_archive,
                                                    tokenize_for_caption_training)
from construction_clip_tpu.models import gpt2 as gpt2_lib
from construction_clip_tpu.models.gpt2 import KVCache, gpt2_forward, _attn_over_cache
from construction_clip_tpu.models.clipcap import init_clipcap, map_prefix
from construction_clip_tpu.train.checkpoint import load_params_npz
from common import load_hf_tokenizer

print("backend:", jax.default_backend(), flush=True)

H, DH = 12, 64
T0 = 47
rng = np.random.default_rng(0)


def np_ref(q, k, v, cache_len, anc=None):
    if anc is not None:
        idx = anc[:, None, :, None]  # [B,1,T,1], as in _attn_over_cache
        k = np.take_along_axis(k, idx, axis=0)
        v = np.take_along_axis(v, idx, axis=0)
    logits = np.einsum("bhqd,bhkd->bhqk", q, k) * DH ** -0.5
    kpos = np.arange(k.shape[2])[None, :]
    logits = np.where(cache_len >= kpos, logits, -1e30)
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    return np.einsum("bhqk,bhkd->bhqd", p, v)


print("--- 1: op-level sweep (_attn_over_cache t==1)", flush=True)
for rows in (8, 24):
    for tmax in (59, 147):
        q = rng.normal(size=(rows, H, 1, DH)).astype(np.float32)
        k = rng.normal(size=(rows, H, tmax, DH)).astype(np.float32)
        v = rng.normal(size=(rows, H, tmax, DH)).astype(np.float32)
        k[:, :, T0 + 1:] = 0
        v[:, :, T0 + 1:] = 0
        anc_id = np.tile(np.arange(rows, dtype=np.int32)[:, None], (1, tmax))
        anc_sh = anc_id.copy()
        anc_sh[:, :T0] = (anc_id[:, :T0] // 3 * 3
                          + (anc_id[:, :T0] + 1) % 3) if rows == 24 else \
            (anc_id[:, :T0][::-1])
        for tag, anc in (("none", None), ("id", anc_id), ("sh", anc_sh)):
            ref = np_ref(q, k, v, T0, anc)
            for dt in (jnp.bfloat16, jnp.float32):
                out = jax.jit(_attn_over_cache)(
                    jnp.asarray(q, dt), jnp.asarray(k, dt), jnp.asarray(v, dt),
                    jnp.full((), T0, jnp.int32), None,
                    jnp.asarray(anc) if anc is not None else None)
                err = np.abs(np.asarray(out, np.float32)[:, :, 0] - ref[:, :, 0]).max()
                print(f"rows={rows} tmax={tmax} anc={tag} {dt.__name__}: "
                      f"max err {err:.4f}", flush=True)

print("--- 2: one gpt2_forward step standalone (rows=24)", flush=True)
N, BEAM = 8, 3
arch = load_archive("runs/e2e/embedding.npz")
tok = load_hf_tokenizer("runs/e2e/assets/bert_zh_vocab")
ccfg = ClipCapConfig(clip_dim=512)
gcfg = GPT2Config()
params = load_params_npz("runs/e2e/models/clipcap.npz",
                         init_clipcap(jax.random.key(0), ccfg, gcfg))
data = tokenize_for_caption_training(arch, tok, attribute_length=ccfg.attribute_length)

for max_steps in (12, 100):
    outs = {}
    for pol in (BF16_POLICY, DEFAULT_POLICY):
        pre = map_prefix(params["mapper"], ccfg, gcfg,
                         jnp.asarray(data["prefix"][:N]), policy=pol)
        ae = gpt2_lib.embed_tokens(params["gpt"], jnp.asarray(data["attribute"][:N]),
                                   policy=pol)
        prompt = jnp.concatenate([pre.astype(ae.dtype), ae], axis=1)
        pp = jax.tree.map(jnp.asarray, _precast(params["gpt"], pol))

        @jax.jit
        def init(pp, embeds):
            last, cache = _prefill(pp, gcfg, embeds, max_steps, pol)
            _, nxt = jax.lax.top_k(
                jax.nn.log_softmax(last.astype(jnp.float32) / 0.5, -1), BEAM)
            cache = KVCache(k=jnp.repeat(cache.k, BEAM, axis=1),
                            v=jnp.repeat(cache.v, BEAM, axis=1),
                            length=cache.length)
            return nxt, cache

        @jax.jit
        def one_step(pp, toks, cache, anc):
            lg, _ = gpt2_forward(pp, gcfg, tokens=toks, cache=cache,
                                 cache_ancestry=anc, policy=pol)
            return lg[:, 0]

        nxt, cache = init(pp, prompt)
        t_total = cache.k.shape[3]
        own = (jnp.arange(N)[:, None] * BEAM
               + jnp.arange(BEAM)[None, :]).astype(jnp.int32)
        anc = jnp.broadcast_to(own[..., None],
                               (N, BEAM, t_total)).reshape(N * BEAM, t_total)
        lg = one_step(pp, nxt.reshape(N * BEAM, 1), cache, anc)
        lg32 = np.asarray(lg, np.float32)
        name = pol.compute_dtype.__name__ if hasattr(pol.compute_dtype, "__name__") \
            else str(pol.compute_dtype)
        outs[name] = lg32
        spread = (lg32.max(-1) - lg32.min(-1))
        print(f"steps={max_steps} {name}: argmax={lg32.argmax(-1)[:6].tolist()} "
              f"row-spread min={spread.min():.3f}", flush=True)
    d = np.abs(outs["bfloat16"] - outs["float32"]).max()
    am = (outs["bfloat16"].argmax(-1) == outs["float32"].argmax(-1)).mean()
    print(f"steps={max_steps} bf16-vs-fp32: max|diff|={d:.3f} argmax-agree={am:.2f}",
          flush=True)
print("DIAG10_DONE", flush=True)

"""Greedy-decode per-step attribution on the real chip (VERDICT r2 item 6).

Times a 100-step while_loop greedy decode at B=32 in ablation variants, each a
local copy of the gpt2_forward cached-scan body (models/gpt2.py:236-266), so
component costs are measured IN-JIT (per-dispatch tunnel overhead excluded):

  full       the real decode step (== infer/decode.greedy_decode inner loop)
  no_attn    attention-over-cache replaced with q (cache writes kept)
  no_cachew  no cache row writes (attention over the stale cache)
  no_mlp     MLP skipped
  no_lmhead  lm head replaced by a 128-wide projection (argmax over 128)
  loop_floor body = carry bump only (while_loop + token bookkeeping floor)
  floor_tiny loop_floor with the KV cache NOT in the carry (isolates whether
             the 0.4 ms floor is while_loop mechanics or carry buffer traffic)
  scan_floor loop_floor under lax.scan (fixed 100 steps, no cond) — if the
             while floor is a cond-read hazard copying the cache, scan dodges it
  scan_full  the full body under lax.scan (no early-exit semantics)
  op_floor   body = 120 CHAINED trivial ops on a [B, n_embd] tensor — the
             per-op issue latency floor for a decode-step-shaped program
             (the real body is ~10 ops x 12 layers + head); if this measures
             a large fraction of the full step, op dispatch binds the decode
             and no kernel fusion of the attention read can reach roofline
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/cctpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from construction_clip_tpu.core.configs import GPT2Config
from construction_clip_tpu.core.precision import BF16_POLICY
from construction_clip_tpu.models.gpt2 import (KVCache, _attn_over_cache,
                                               _linear, _lm_logits, gelu_new,
                                               gpt2_forward, init_gpt2,
                                               merge_heads, split_heads)
from construction_clip_tpu.ops.norms import layer_norm

B, STEPS, PROMPT = 32, 100, 40
cfg = GPT2Config()
params = init_gpt2(jax.random.key(0), cfg)
policy = BF16_POLICY


def make_decode(variant: str):
    def run(p_raw, embeds):
        p = policy.cast_to_compute(p_raw)
        logits, cache = gpt2_forward(p_raw, cfg, inputs_embeds=embeds,
                                     cache=KVCache.create(
                                         cfg, B, PROMPT + STEPS + 1,
                                         dtype=policy.compute_dtype),
                                     policy=policy)
        tok0 = jnp.argmax(logits[:, -1].astype(jnp.float32), axis=-1)

        if variant == "floor_tiny":
            def tiny_body(s):
                step, tok, length = s
                return step + 1, tok, length + 1

            s = (jnp.zeros((), jnp.int32), tok0, jnp.full((), PROMPT, jnp.int32))
            s = jax.lax.while_loop(lambda s: s[0] < STEPS, tiny_body, s)
            return s[1]

        if variant == "op_floor":
            # 120 CHAINED [B,768]@[768,768] dots — XLA cannot fuse dots into
            # each other, so each is its own kernel; tiny GEMMs are
            # latency-bound, giving the per-op issue floor at the real body's
            # op granularity (~10 ops x 12 layers + head)
            w1 = (p["blocks"]["attn"]["c_proj_w"][0]).astype(jnp.bfloat16)
            w2 = (p["blocks"]["ln_1"]["scale"][0] + 1.0).astype(jnp.bfloat16)

            def op_body(s):
                step, x, length = s
                for i in range(60):
                    x = (x @ w1).astype(jnp.bfloat16)
                    x = (x * w2 @ w1).astype(jnp.bfloat16)
                x = x * 1e-30  # keep magnitudes bounded across 100 steps
                return step + 1, x, length + 1

            x0 = jnp.zeros((B, cfg.n_embd), jnp.bfloat16)
            s = (jnp.zeros((), jnp.int32), x0, jnp.full((), PROMPT, jnp.int32))
            s = jax.lax.while_loop(lambda s: s[0] < STEPS, op_body, s)
            return s[1][:, 0]

        def body(s):
            step, tok, ck_all, cv_all, length = s
            if variant in ("loop_floor", "scan_floor"):
                return step + 1, tok, ck_all, cv_all, length + 1
            x = p["wte"][tok[:, None]] + p["wpe"][length + jnp.zeros((1,), jnp.int32)]

            def layer(carry, lp):
                h, ck_a, cv_a, l = carry
                y = layer_norm(h, **lp["ln_1"], eps=cfg.layer_norm_epsilon)
                qkv = _linear(y, lp["attn"]["c_attn_w"], lp["attn"]["c_attn_b"])
                q, k, v = (split_heads(z, cfg.n_head)
                           for z in jnp.split(qkv, 3, axis=-1))
                if variant != "no_cachew":
                    ck_a = jax.lax.dynamic_update_slice(
                        ck_a, k.astype(ck_a.dtype)[None], (l, 0, 0, length, 0))
                    cv_a = jax.lax.dynamic_update_slice(
                        cv_a, v.astype(cv_a.dtype)[None], (l, 0, 0, length, 0))
                if variant == "no_attn":
                    out = q
                else:
                    ck = jax.lax.dynamic_index_in_dim(ck_a, l, 0, keepdims=False)
                    cv = jax.lax.dynamic_index_in_dim(cv_a, l, 0, keepdims=False)
                    out = _attn_over_cache(q, ck, cv, length, None)
                h = h + _linear(merge_heads(out), lp["attn"]["c_proj_w"],
                                lp["attn"]["c_proj_b"])
                if variant != "no_mlp":
                    y = layer_norm(h, **lp["ln_2"], eps=cfg.layer_norm_epsilon)
                    y = gelu_new(_linear(y, lp["mlp"]["c_fc_w"], lp["mlp"]["c_fc_b"]))
                    h = h + _linear(y, lp["mlp"]["c_proj_w"], lp["mlp"]["c_proj_b"])
                return (h, ck_a, cv_a, l + 1), None

            (x, ck_all, cv_all, _), _ = jax.lax.scan(
                layer, (x, ck_all, cv_all, jnp.zeros((), jnp.int32)), p["blocks"])
            x = layer_norm(x, **p["ln_f"], eps=cfg.layer_norm_epsilon)
            if variant == "no_lmhead":
                lg = (x[:, 0] @ p["wte"].T[:, :128]).astype(jnp.float32)
            else:
                lg = _lm_logits(p, x[:, 0])
            tok = jnp.argmax(lg, axis=-1)
            return step + 1, tok, ck_all, cv_all, length + 1

        s = (jnp.zeros((), jnp.int32), tok0, cache.k, cache.v,
             jnp.full((), PROMPT, jnp.int32))
        if variant.startswith("scan_"):
            s, _ = jax.lax.scan(lambda s, _: (body(s), None), s, None,
                                length=STEPS)
        else:
            s = jax.lax.while_loop(lambda s: s[0] < STEPS, body, s)
        return s[1]

    return jax.jit(run)


embeds = jax.random.normal(jax.random.key(1), (B, PROMPT, cfg.n_embd),
                           jnp.bfloat16)
results = {}
for variant in ("full", "no_attn", "no_cachew", "no_mlp", "no_lmhead",
                "loop_floor", "floor_tiny", "scan_floor", "scan_full",
                "op_floor"):
    fn = make_decode(variant)
    out = fn(params, embeds)
    _ = np.asarray(out)
    for _ in range(2):
        out = fn(params, embeds)
    _ = np.asarray(out)
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = fn(params, embeds)
        _ = np.asarray(out)
        times.append((time.perf_counter() - t0) / STEPS * 1e3)
    times.sort()
    results[variant] = round(times[2], 4)
    print(f"{variant}: {times[2]:.3f} ms/step [{times[0]:.3f},{times[-1]:.3f}]",
          flush=True)
print(json.dumps(results), flush=True)

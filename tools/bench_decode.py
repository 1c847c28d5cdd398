#!/usr/bin/env python
"""Caption-decode throughput on the real chip (BASELINE.md metric: decode tokens/sec).

Measures, at ckiplab/gpt2-base-chinese scale (12L/768, prefix 40 tokens, 100 steps):
  - KV-cached greedy decode (ours), batch 1 and batch 32;
  - beam-3 decode (ours), batch 8;
  - a "reference-style" decode: NO cache, the full growing sequence re-forwarded
    every step (reference CLIP_prefix_caption/test.py:380-381) — emulated as a
    full-length forward per generated token, which is the reference's final-step
    cost per token (a LOWER bound on its true O(n^2) total).

Prints a JSON summary to stdout; diagnostics to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax

    cache_dir = os.path.expanduser("~/.cache/cctpu_xla")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from construction_clip_tpu.core.configs import GPT2Config, ClipCapConfig
    from construction_clip_tpu.core.precision import BF16_POLICY
    from construction_clip_tpu.models.clipcap import init_clipcap, map_prefix
    from construction_clip_tpu.models.gpt2 import embed_tokens, gpt2_forward
    from construction_clip_tpu.infer.decode import greedy_decode, beam_decode

    log(f"backend={jax.default_backend()}")
    gcfg = GPT2Config()
    ccfg = ClipCapConfig()
    params = init_clipcap(jax.random.key(0), ccfg, gcfg)
    STEPS = 100
    results = {}

    def prompt(b):
        emb = map_prefix(params["mapper"], ccfg, gcfg,
                         jax.random.normal(jax.random.key(1), (b, 512)),
                         policy=BF16_POLICY)
        attr = embed_tokens(params["gpt"], jnp.ones((b, 20), jnp.int32),
                            policy=BF16_POLICY)
        return jnp.concatenate([emb, attr], axis=1)

    from bench_util import timed_windows, put_rate

    def timeit(fn, iters=5):
        """median [min,max] per-call seconds over 5 windows (bench_util)."""
        return timed_windows(fn, windows=5, iters=iters, warmup=2)

    for b in (1, 32):
        e = prompt(b)
        st = timeit(lambda: greedy_decode(params["gpt"], gcfg, e, max_steps=STEPS,
                                          stop_token=-1, policy=BF16_POLICY))
        put_rate(results, f"greedy_b{b}_tok_s", st, b * STEPS)
        log(f"greedy b={b}: {st[0]*1e3:.0f} ms -> {b*STEPS/st[0]:.0f} tok/s "
            f"[{results[f'greedy_b{b}_tok_s_minmax']}]")

    # weight-only int8 serving decode (models/gpt2.quantize_gpt2): halves the
    # per-step HBM weight reads that bound the batched path
    from construction_clip_tpu.models.gpt2 import quantize_gpt2

    qgpt = quantize_gpt2(params["gpt"])
    for b in (1, 32):
        e = prompt(b)
        st = timeit(lambda: greedy_decode(qgpt, gcfg, e, max_steps=STEPS,
                                          stop_token=-1, policy=BF16_POLICY))
        put_rate(results, f"greedy_int8_b{b}_tok_s", st, b * STEPS)
        log(f"greedy int8 b={b}: {st[0]*1e3:.0f} ms -> {b*STEPS/st[0]:.0f} tok/s")

    e8 = prompt(8)
    st = timeit(lambda: beam_decode(params["gpt"], gcfg, e8, beam_size=3,
                                    max_steps=STEPS, stop_token=-1,
                                    temperature=0.5, policy=BF16_POLICY), iters=3)
    put_rate(results, "beam3_b8_tok_s", st, 8 * STEPS)
    log(f"beam3 b=8: {st[0]*1e3:.0f} ms -> {8*STEPS/st[0]:.0f} tok/s "
        f"[{results['beam3_b8_tok_s_minmax']}]")

    # reference-style: full-sequence re-forward per token (final-step cost)
    T = 40 + STEPS
    full = jax.jit(lambda p, x: gpt2_forward(p, gcfg, inputs_embeds=x,
                                             policy=BF16_POLICY)[0])
    x = jax.random.normal(jax.random.key(2), (1, T, gcfg.n_embd), dtype=jnp.bfloat16)
    st = timed_windows(lambda: full(params["gpt"], x), windows=5, iters=STEPS,
                       warmup=2)
    ref_dt = st[0] * STEPS
    put_rate(results, "reference_style_nocache_b1_tok_s",
             (st[0] * STEPS, st[1] * STEPS, st[2] * STEPS), STEPS)
    results["kv_cache_speedup_b1"] = round(
        results["greedy_b1_tok_s"] / results["reference_style_nocache_b1_tok_s"], 2)
    log(f"reference-style no-cache b=1: {ref_dt:.2f}s for {STEPS} tokens "
        f"-> {STEPS/ref_dt:.0f} tok/s")

    print(json.dumps(results))


if __name__ == "__main__":
    main()

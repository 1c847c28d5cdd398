#!/usr/bin/env python
"""mT5-small caption decode throughput (BASELINE config 4 inference path):
greedy and sampling via infer/decode_t5.t5_generate, max_length 32 as the
reference uses (train_t5.py:75). Prints one JSON line."""

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

    from construction_clip_tpu.core.configs import T5Config
    from construction_clip_tpu.core.precision import BF16_POLICY
    from construction_clip_tpu.infer.decode_t5 import t5_generate
    from construction_clip_tpu.models.t5 import init_t5

    log(f"backend={jax.default_backend()}")
    cfg = T5Config()  # defaults = google/mt5-small
    params = init_t5(jax.random.key(0), cfg)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating) else x,
        params)
    STEPS = 32
    results = {}

    from construction_clip_tpu.models.t5 import quantize_t5_head

    qparams = quantize_t5_head(params)  # int8 head serving config

    for b in (1, 32):
        # injected encoder states: prefix 20 + attribute-ish 20 tokens of hidden
        enc = jax.random.normal(jax.random.key(1), (b, 40, cfg.d_model),
                                jnp.bfloat16)
        fn = lambda: t5_generate(params, cfg, enc, max_steps=STEPS, do_sample=False,
                                 policy=BF16_POLICY)
        from bench_util import timed_windows, put_rate
        st = timed_windows(fn, windows=5, iters=5, warmup=2)
        put_rate(results, f"t5_greedy_b{b}_tok_s", st, b * STEPS)
        log(f"t5 greedy b={b}: {st[0]*1e3:.0f} ms -> {b*STEPS/st[0]:.0f} tok/s")

        qfn = lambda: t5_generate(qparams, cfg, enc, max_steps=STEPS,
                                  do_sample=False, policy=BF16_POLICY)
        st = timed_windows(qfn, windows=5, iters=5, warmup=2)
        put_rate(results, f"t5_greedy_int8head_b{b}_tok_s", st, b * STEPS)
        log(f"t5 greedy int8-head b={b}: {st[0]*1e3:.0f} ms -> "
            f"{b*STEPS/st[0]:.0f} tok/s")

    print(json.dumps(results))


if __name__ == "__main__":
    main()

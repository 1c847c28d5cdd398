"""Same-process A/B: greedy decode with the t==1 layer loop unrolled (static
cache slices) vs lax.scan (dynamic_index slices). 5-call windows, sync once
per window (tunnel round-trip amortized x5), B=32 and B=1."""
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/cctpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

import construction_clip_tpu.models.gpt2 as gpt2_mod
from construction_clip_tpu.core.configs import GPT2Config
from construction_clip_tpu.core.precision import BF16_POLICY
from construction_clip_tpu.infer.decode import greedy_decode
from construction_clip_tpu.models.gpt2 import init_gpt2

STEPS = 100
cfg = GPT2Config()
params = init_gpt2(jax.random.key(0), cfg)

for B in (32, 1):
    embeds = jax.random.normal(jax.random.key(1), (B, 40, cfg.n_embd),
                               jnp.bfloat16)
    for label, unroll, kern in (("scan", False, False),
                                ("kernel-g", False, True)):
        gpt2_mod.UNROLL_DECODE = unroll
        gpt2_mod.DECODE_ATTN_KERNEL = kern
        jax.clear_caches()
        fn = jax.jit(lambda p, e: greedy_decode(p, cfg, e, max_steps=STEPS,
                                                stop_token=-1,
                                                policy=BF16_POLICY))
        out = fn(params, embeds)
        _ = np.asarray(out.tokens)
        for _ in range(3):
            out = fn(params, embeds)
        _ = np.asarray(out.tokens)
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(5):
                out = fn(params, embeds)
            _ = np.asarray(out.tokens)
            times.append((time.perf_counter() - t0) / 5)
        times.sort()
        med = times[2]
        print(f"B={B} {label}: {med*1e3:.1f} ms/call -> {B*STEPS/med:.0f} tok/s"
              f" [{times[0]*1e3:.1f},{times[-1]*1e3:.1f}]", flush=True)
gpt2_mod.DECODE_ATTN_KERNEL = False
print("AB DONE", flush=True)

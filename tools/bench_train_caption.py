#!/usr/bin/env python
"""ClipCap (config 3) and mT5 (config 4) caption TRAIN-step time on the chip:
fwd+bwd+AdamW at reference shapes (prefix 20 + attribute 20, caption tokens 60 /
max_length 32), full fine-tune and frozen-LM (only_prefix) variants for the
GPT-2 path. Prints one JSON line."""

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

    from construction_clip_tpu.core.configs import (ClipCapConfig, GPT2Config,
                                                    T5Config)
    from construction_clip_tpu.core.mesh import create_mesh, DATA_AXIS, MODEL_AXIS
    from construction_clip_tpu.core.precision import BF16_POLICY
    from construction_clip_tpu.models.clipcap import init_clipcap
    from construction_clip_tpu.models.clipcap.t5_model import init_clipcap_t5
    from construction_clip_tpu.train.caption import make_caption_train_step
    from construction_clip_tpu.train.t5 import make_t5_caption_train_step
    from construction_clip_tpu.train.state import TrainState, make_adamw

    log(f"backend={jax.default_backend()}")
    mesh = create_mesh({DATA_AXIS: len(jax.devices()), MODEL_AXIS: 1})
    tx = make_adamw(2e-5, warmup_steps=0, total_steps=10_000)
    results = {}
    B, T = 64, 60

    from bench_util import timed_windows

    def timeit(step, state, *args, iters=10, warm=5):
        """median [min,max] seconds/step over 5 windows + final loss."""
        holder = [state]

        def one():
            s, m = step(holder[0], *args)
            holder[0] = s
            return m["loss"]

        st = timed_windows(one, windows=5, iters=iters, warmup=warm,
                           sync=lambda o: np.asarray(o))
        loss = float(step(holder[0], *args)[1]["loss"])
        return st, loss

    gcfg = GPT2Config()
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(1, gcfg.vocab_size, (B, T)), jnp.int32)
    attr = jnp.asarray(rng.integers(1, gcfg.vocab_size, (B, 20)), jnp.int32)
    prefix = jax.random.normal(jax.random.key(1), (B, 512))
    for only_prefix in (False, True):
        ccfg = ClipCapConfig(only_prefix=only_prefix)
        params = init_clipcap(jax.random.key(0), ccfg, gcfg)
        step = make_caption_train_step(ccfg, gcfg, tx, mesh, policy=BF16_POLICY)
        if only_prefix:
            state = TrainState.create(params["mapper"], tx)
            frozen = params["gpt"]
        else:
            state = TrainState.create(params, tx)
            frozen = None
        batch = {"tokens": tokens, "prefix": prefix, "attribute": attr}
        st, loss = timeit(step, state, frozen, batch)
        name = "clipcap_frozen" if only_prefix else "clipcap_full"
        from bench_util import put_ms, put_rate
        put_ms(results, f"{name}_step_ms_b{B}", st, ndigits=1)
        put_rate(results, f"{name}_seq_s_b{B}", st, B)
        log(f"{name}: {st[0]*1e3:.1f} ms/step ({B/st[0]:.0f} seq/s, loss {loss:.3f})")
        del state, step, params

    tcfg = T5Config()
    ccfg = ClipCapConfig(only_prefix=False)
    params = init_clipcap_t5(jax.random.key(0), ccfg, tcfg)
    step = make_t5_caption_train_step(ccfg, tcfg, tx, mesh, policy=BF16_POLICY)
    state = TrainState.create(params, tx)
    ids = jnp.asarray(rng.integers(1, 30000, (B, 32)), jnp.int32)
    mask = jnp.ones((B, 32), jnp.int32)
    batch = {"input_ids": ids, "attention_mask": mask,
             "prefix": jax.random.normal(jax.random.key(2), (B, 512))}
    st, loss = timeit(step, state, None, batch)
    from bench_util import put_ms, put_rate
    put_ms(results, f"t5_full_step_ms_b{B}", st, ndigits=1)
    put_rate(results, f"t5_full_seq_s_b{B}", st, B)
    log(f"t5_full: {st[0]*1e3:.1f} ms/step ({B/st[0]:.0f} seq/s, loss {loss:.3f})")

    print(json.dumps(results))


if __name__ == "__main__":
    main()

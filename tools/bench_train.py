#!/usr/bin/env python
"""Contrastive train-step time on the real chip (BASELINE.md metric).

ViT-B/32 CLIP, bf16 compute / fp32 params+optimizer, full forward+backward+AdamW,
global-batch symmetric InfoNCE. Prints a JSON summary; diagnostics to stderr.
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

    from construction_clip_tpu.core.configs import CLIPConfig
    from construction_clip_tpu.core.mesh import create_mesh, DATA_AXIS, MODEL_AXIS
    from construction_clip_tpu.core.precision import BF16_POLICY
    from construction_clip_tpu.models.clip import init_clip
    from construction_clip_tpu.train.contrastive import make_train_step
    from construction_clip_tpu.train.state import TrainState, make_adamw

    log(f"backend={jax.default_backend()}")
    cfg = CLIPConfig.vit_b_32()
    mesh = create_mesh({DATA_AXIS: len(jax.devices()), MODEL_AXIS: 1})
    tx = make_adamw(1e-5, warmup_steps=0, total_steps=1000)

    results = {}
    for batch_size, remat in ((128, False), (256, False), (256, True)):
        params = init_clip(jax.random.key(0), cfg)
        step = make_train_step(cfg, tx, mesh, policy=BF16_POLICY, remat=remat)
        state = TrainState.create(params, tx)
        toks = jnp.zeros((batch_size, 77), jnp.int32).at[:, 0].set(49406)
        toks = toks.at[:, 1].set(49407)
        batch = {
            "images": jax.random.normal(jax.random.key(1),
                                        (batch_size, 224, 224, 3), dtype=jnp.float32),
            "tokens": toks,
        }
        try:
            from bench_util import timed_windows, put_ms, put_rate

            holder = [state]

            def one():
                s, m = step(holder[0], batch)
                holder[0] = s
                return m["loss"]

            st = timed_windows(one, windows=5, iters=10, warmup=5,
                               sync=lambda o: np.asarray(o))
            tag = ("_remat" if remat else "")
            put_ms(results, f"step_ms_b{batch_size}" + tag, st, ndigits=1)
            put_rate(results, f"train_img_s_b{batch_size}" + tag, st, batch_size)
            log(f"b={batch_size} remat={remat}: {st[0]*1e3:.1f} ms/step "
                f"[{st[1]*1e3:.1f},{st[2]*1e3:.1f}] ({batch_size/st[0]:.0f} img/s)")
        except Exception as e:  # OOM at large batch is informative, not fatal
            log(f"b={batch_size} remat={remat}: {type(e).__name__}: {e}")
            results[f"step_b{batch_size}_error"] = type(e).__name__

    print(json.dumps(results))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""BASELINE.json config 5 on the chip: ViT-L/14 single-chip contrastive step
(largest batch that fits, with remat) + batched caption scoring throughput
(the score.py product path, reference CLIP_prefix_caption/score.py:8-25).

Multi-chip shardings for this config are exercised on the virtual mesh by
tests/test_tensor_parallel.py and __graft_entry__.dryrun_multichip; this tool
records the real-chip single-device numbers. Prints one JSON line.
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
    results = {}

    cfg = CLIPConfig.vit_l_14()
    mesh = create_mesh({DATA_AXIS: len(jax.devices()), MODEL_AXIS: 1})
    tx = make_adamw(1e-5, warmup_steps=0, total_steps=1000)

    for batch_size, remat in ((64, True), (32, True)):
        try:
            params = init_clip(jax.random.key(0), cfg)
            step = make_train_step(cfg, tx, mesh, policy=BF16_POLICY, remat=remat)
            state = TrainState.create(params, tx)
            toks = jnp.zeros((batch_size, 77), jnp.int32).at[:, 0].set(49406)
            toks = toks.at[:, 1].set(49407)
            batch = {
                "images": jax.random.normal(
                    jax.random.key(1), (batch_size, 224, 224, 3), jnp.float32),
                "tokens": toks,
            }
            for _ in range(5):
                state, m = step(state, batch)
            _ = float(m["loss"])
            iters = 10
            t0 = time.perf_counter()
            for _ in range(iters):
                state, m = step(state, batch)
            _ = np.asarray(state.step)
            dt = (time.perf_counter() - t0) / iters
            results[f"vitl_step_ms_b{batch_size}"] = round(dt * 1e3, 1)
            results[f"vitl_img_s_b{batch_size}"] = round(batch_size / dt, 1)
            log(f"ViT-L/14 b={batch_size} remat={remat}: {dt*1e3:.1f} ms/step "
                f"({batch_size/dt:.0f} img/s)")
            del state, step, params, batch
            break  # largest fitting batch recorded; skip smaller
        except Exception as e:
            log(f"ViT-L/14 b={batch_size}: {type(e).__name__}: {str(e)[:200]}")
            results[f"vitl_b{batch_size}_error"] = type(e).__name__

    # batched caption scoring (host-side, the score.py path)
    from construction_clip_tpu.infer.score import score_pairs

    rng = np.random.default_rng(0)
    chars = [chr(0x4E00 + i) for i in range(500)]
    pairs = [("".join(rng.choice(chars, size=30)), "".join(rng.choice(chars, size=28)))
             for _ in range(2000)]
    t0 = time.perf_counter()
    out = score_pairs(pairs)
    dt = time.perf_counter() - t0
    results["score_pairs_per_s"] = round(len(pairs) / dt, 1)
    results["score_bleu_mean"] = round(out["bleu"], 5)
    log(f"score_pairs: {len(pairs)} pairs in {dt:.2f}s -> {len(pairs)/dt:.0f} pairs/s")

    print(json.dumps(results))


if __name__ == "__main__":
    main()

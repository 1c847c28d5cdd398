#!/usr/bin/env python
"""On-chip A/B: ViT-L/14 b=64 save_preact step with scan unroll=FULL (default
on TPU) vs unroll=1. Full unroll helps fwd-only towers (-24%, verify
SKILL.md), but under per-layer remat the round-3 sweep saw policies with
strictly less recompute measure SLOWER — a scheduling effect. unroll=1 gives
XLA a per-layer backward schedule instead of one 24-layer graph; this
measures whether that recovers the anomaly.

Prints one JSON line.
"""
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))  # tools/ (bench_util)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # repo root

from bench_util import log, put_ms, setup_jax_cache, timed_windows


def main():
    import jax

    setup_jax_cache()
    import jax.numpy as jnp
    import numpy as np

    from construction_clip_tpu.core.configs import CLIPConfig
    from construction_clip_tpu.core.mesh import create_mesh, DATA_AXIS, MODEL_AXIS
    from construction_clip_tpu.core.precision import BF16_POLICY
    from construction_clip_tpu.models import blocks as blocks_mod
    from construction_clip_tpu.models.clip import init_clip, model as clip_model
    from construction_clip_tpu.train.contrastive import make_train_step
    from construction_clip_tpu.train.state import TrainState, make_adamw

    log(f"backend={jax.default_backend()}")
    B = 64
    cfg = CLIPConfig.vit_l_14()
    mesh = create_mesh({DATA_AXIS: len(jax.devices()), MODEL_AXIS: 1})
    tx = make_adamw(1e-5, warmup_steps=0, total_steps=1000)
    toks = jnp.zeros((B, 77), jnp.int32).at[:, 0].set(49406).at[:, 1].set(49407)
    batch = {
        "images": jax.random.normal(jax.random.key(1), (B, 224, 224, 3),
                                    jnp.float32),
        "tokens": toks,
    }
    results = {}

    orig = blocks_mod.apply_stack
    for tag, unroll in (("unroll1", 1), ("full_unroll", None)):
        stack = orig if unroll is None else functools.partial(orig, unroll=unroll)
        clip_model.apply_stack = stack
        try:
            params = init_clip(jax.random.key(0), cfg)
            step = make_train_step(cfg, tx, mesh, policy=BF16_POLICY,
                                   remat="save_preact")
            state = TrainState.create(params, tx)
            holder = [state]

            def one():
                s, m = step(holder[0], batch)
                holder[0] = s
                return m["loss"]

            st = timed_windows(one, windows=5, iters=5, warmup=5,
                               sync=lambda o: np.asarray(o))
            put_ms(results, f"vitl_step_ms_b{B}_{tag}", st, ndigits=1)
            log(f"ViT-L b={B} save_preact {tag}: {st[0]*1e3:.1f} ms/step "
                f"[{st[1]*1e3:.1f},{st[2]*1e3:.1f}]")
            del state, step, params, holder
            jax.clear_caches()
        except Exception as e:
            log(f"{tag}: {type(e).__name__}: {str(e)[:300]}")
            results[f"vitl_b{B}_{tag}_error"] = type(e).__name__
        finally:
            clip_model.apply_stack = orig
    print(json.dumps(results))


if __name__ == "__main__":
    main()

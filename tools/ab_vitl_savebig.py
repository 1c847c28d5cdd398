#!/usr/bin/env python
"""On-chip check: ViT-L/14 b=64 step with save_big (cheapest recompute,
~270 MB/layer kept) and no-remat, now that unroll=1-under-remat lowered peak
scheduling memory enough to fit save_qkv_mlp/save_mlp_hidden. Prints one JSON
line."""
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
    from construction_clip_tpu.core.mesh import DATA_AXIS, MODEL_AXIS, create_mesh
    from construction_clip_tpu.core.precision import BF16_POLICY
    from construction_clip_tpu.train.contrastive import make_train_step
    from construction_clip_tpu.train.state import TrainState, make_adamw
    from construction_clip_tpu.models.clip import init_clip

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
    for tag, remat in (("save_big", "save_big"), ("no_remat", False)):
        try:
            params = init_clip(jax.random.key(0), cfg)
            step = make_train_step(cfg, tx, mesh, policy=BF16_POLICY, remat=remat)
            state = TrainState.create(params, tx)
            holder = [state]

            def one():
                s, m = step(holder[0], batch)
                holder[0] = s
                return m["loss"]

            st = timed_windows(one, windows=5, iters=5, warmup=5,
                               sync=lambda o: np.asarray(o))
            put_ms(results, f"vitl_step_ms_b{B}_{tag}", st, ndigits=1)
            log(f"ViT-L b={B} {tag}: {st[0]*1e3:.1f} ms/step "
                f"[{st[1]*1e3:.1f},{st[2]*1e3:.1f}]")
            del state, step, params, holder
            jax.clear_caches()
        except Exception as e:
            log(f"{tag}: {type(e).__name__}: {str(e)[:300]}")
            results[f"vitl_b{B}_{tag}_error"] = type(e).__name__
    print(json.dumps(results))


if __name__ == "__main__":
    main()

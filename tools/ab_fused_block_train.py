#!/usr/bin/env python
"""On-chip A/B: full contrastive train step b=128 with the fused attention
block ON (default) vs OFF (composable path: XLA LN/GEMMs + flash-attention
custom-VJP kernel). The block kernel was designed for ENCODE; this measures
whether its monolithic backward still earns its keep in TRAINING, where the
ablation shows bwd running 3.7x fwd (ideal ~2x).

Prints one JSON line.
"""
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
    from construction_clip_tpu.models.clip import init_clip
    from construction_clip_tpu.ops import pallas_attention_block as fab
    from construction_clip_tpu.train.contrastive import make_train_step
    from construction_clip_tpu.train.state import TrainState, make_adamw

    log(f"backend={jax.default_backend()}")
    B = 128
    cfg = CLIPConfig.vit_b_32()
    mesh = create_mesh({DATA_AXIS: len(jax.devices()), MODEL_AXIS: 1})
    tx = make_adamw(1e-5, warmup_steps=0, total_steps=1000)
    toks = jnp.zeros((B, 77), jnp.int32).at[:, 0].set(49406).at[:, 1].set(49407)
    batch = {
        "images": jax.random.normal(jax.random.key(1), (B, 224, 224, 3),
                                    jnp.float32),
        "tokens": toks,
    }
    results = {}

    orig_supported = fab.supported
    for tag, block_on in (("block", True), ("composable", False)):
        fab.supported = orig_supported if block_on else (lambda x, h: False)
        try:
            params = init_clip(jax.random.key(0), cfg)
            step = make_train_step(cfg, tx, mesh, policy=BF16_POLICY)
            state = TrainState.create(params, tx)
            holder = [state]

            def one():
                s, m = step(holder[0], batch)
                holder[0] = s
                return m["loss"]

            st = timed_windows(one, windows=5, iters=5, warmup=5,
                               sync=lambda o: np.asarray(o))
            put_ms(results, f"step_ms_b{B}_{tag}", st, ndigits=2)
            log(f"b={B} {tag}: {st[0]*1e3:.2f} ms/step "
                f"[{st[1]*1e3:.2f},{st[2]*1e3:.2f}]")
            del state, step, params, holder
            jax.clear_caches()
        finally:
            fab.supported = orig_supported
    print(json.dumps(results))


if __name__ == "__main__":
    main()

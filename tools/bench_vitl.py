#!/usr/bin/env python
"""BASELINE.json config 5 on the chip: ViT-L/14 single-chip contrastive step
(largest batch that fits, with remat) + batched caption scoring throughput
(the score.py product path, reference CLIP_prefix_caption/score.py:8-25).

Multi-chip shardings for this config are exercised on the virtual mesh by
tests/test_tensor_parallel.py and __graft_entry__.dryrun_multichip; this tool
records the real-chip single-device numbers. Prints one JSON line.
"""

from __future__ import annotations

import functools
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
    from bench_util import timed_windows, put_ms, put_rate

    B = 64
    toks = jnp.zeros((B, 77), jnp.int32).at[:, 0].set(49406)
    toks = toks.at[:, 1].set(49407)
    batch = {
        "images": jax.random.normal(jax.random.key(1), (B, 224, 224, 3),
                                    jnp.float32),
        "tokens": toks,
    }

    # attribution (fwd-only + optimizer-only) runs FIRST so its params copy
    # isn't competing with the sweep's HBM residue (the r3 first run OOM'd here)
    def _attribution():
        from construction_clip_tpu.models.clip import encode_image, encode_text
        from construction_clip_tpu.parallel.infonce import local_infonce
        from construction_clip_tpu.train.state import apply_gradients

        params = init_clip(jax.random.key(0), cfg)

        @jax.jit
        def fwd(p, images, tokens):
            i = encode_image(p, cfg, images, policy=BF16_POLICY, normalize=True)
            t = encode_text(p, cfg, tokens, policy=BF16_POLICY, normalize=True)
            return local_infonce(i, t, p["logit_scale"])[0]

        st = timed_windows(lambda: fwd(params, batch["images"], batch["tokens"]),
                           windows=5, iters=5, warmup=5,
                           sync=lambda o: np.asarray(o))
        put_ms(results, f"vitl_fwd_ms_b{B}", st, ndigits=1)
        log(f"fwd-only: {st[0]*1e3:.1f} ms")

        state = TrainState.create(params, tx)
        grads = jax.tree.map(lambda x: (x * 1e-3).astype(x.dtype)
                             if jnp.issubdtype(x.dtype, jnp.floating) else x,
                             params)

        # donate the state: in+out 5.1 GB fp32 states coexisting alongside
        # params+grads is itself an HBM OOM at ViT-L scale (r3 measured)
        @functools.partial(jax.jit, donate_argnums=(0,))
        def opt_only(s, g):
            return apply_gradients(s, g, tx)

        holder = [state]

        def one_opt():
            holder[0] = opt_only(holder[0], grads)
            return holder[0].step

        st = timed_windows(one_opt, windows=5, iters=10, warmup=5,
                           sync=lambda o: np.asarray(o))
        put_ms(results, "vitl_adamw_ms", st, ndigits=2)
        log(f"fused AdamW only (428M fp32 state): {st[0]*1e3:.2f} ms")

    try:
        _attribution()
    except Exception as e:
        log(f"attribution: {type(e).__name__}: {str(e)[:300]}")
    # drop every buffer the attribution phase pinned (jit caches hold weakrefs
    # to executables, not arrays, but the module-level params/state would
    # otherwise survive into the sweep and tip b=64 over HBM)
    import gc

    jax.clear_caches()
    gc.collect()

    # remat policy sweep (models/blocks.apply_stack): full recompute vs the
    # selective save_qkv policy (BASELINE.md config-5 attribution). save_big /
    # save_mlp_hidden keep 3-7 GB of ViT-L activations at b=64 and fail remote
    # compile against the 16 GB HBM alongside the 6.8 GB fp32 AdamW state —
    # save_qkv (2.4 GB kept) is the largest policy that fits. Best fitting
    # policy becomes the headline row.
    # order matters: the KNOWN-FITTING policies run first — a failed remote
    # compile degrades the tunnel's subsequent compiles for ~10-15 min
    # (verify SKILL.md), so the experimental over-budget policies
    # (save_qkv_mlp / save_mlp_hidden, recorded OOMs at b=64) go LAST where
    # their failures cannot contaminate the headline timings
    best = None
    default_policies = ("save_qkv", True, "save_qkv_attn_out", "save_preact",
                        "save_attn_preact", "save_qkv_mlp", "save_mlp_hidden")
    only = os.environ.get("VITL_POLICIES")  # comma-separated subset for iteration
    policies = tuple(p if p != "full" else True for p in only.split(",")) \
        if only else default_policies
    for remat in policies:
        tag = remat if isinstance(remat, str) else "full"
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
            log(f"ViT-L/14 b={B} remat={tag}: {st[0]*1e3:.1f} ms/step "
                f"[{st[1]*1e3:.1f},{st[2]*1e3:.1f}] ({B/st[0]:.0f} img/s)")
            if best is None or st[0] < best[1][0]:
                best = (tag, st)
            del state, step, params, holder
        except Exception as e:
            log(f"ViT-L/14 b={B} remat={tag}: {type(e).__name__}: {str(e)[:300]}")
            results[f"vitl_b{B}_{tag}_error"] = type(e).__name__
    if best is not None:
        tag, st = best
        put_ms(results, f"vitl_step_ms_b{B}", st, ndigits=1)
        put_rate(results, f"vitl_img_s_b{B}", st, B)
        results["vitl_best_remat"] = tag

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

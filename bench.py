"""Headline benchmark: CLIP ViT-B/32 image encode throughput (images/sec/chip, bf16).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

vs_baseline: the reference publishes no numbers (BASELINE.md) — the divisor is the
north-star proxy of the reference pipeline's GPU throughput: torch fp32 ViT-B/32
inference on the reference's class of hardware, ~400 images/sec (BASELINE.json asks
for >5x reference GPU images/sec). Refine when a measured reference number exists.

Timing notes (see .claude/skills/verify/SKILL.md): block_until_ready through the axon
tunnel can return early, so the timer syncs via a host transfer of the final output;
executions are in-order so that bounds the whole run.
"""

from __future__ import annotations

import json
import sys
import time

REFERENCE_GPU_IMG_S = 400.0  # torch fp32 ViT-B/32 on the reference's single GPU (proxy)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import os
    import threading

    # Hang guard: first-ever compiles through the TPU tunnel can take ~35 min and
    # the tunnel occasionally wedges; exit non-zero rather than hang the driver.
    def _abort():
        log("bench watchdog: no completion after 50 min — aborting")
        os._exit(3)

    guard = threading.Timer(50 * 60, _abort)
    guard.daemon = True
    guard.start()

    import jax

    # Persistent compile cache: batch-256 ViT-B/32 takes ~35 min to compile through
    # the axon tunnel the FIRST time; cached compiles load in seconds.
    cache_dir = os.environ.get("CCTPU_COMPILE_CACHE",
                               os.path.expanduser("~/.cache/cctpu_xla"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from construction_clip_tpu.core.configs import CLIPConfig
    from construction_clip_tpu.core.precision import BF16_POLICY
    from construction_clip_tpu.models.clip import init_clip, encode_image

    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    cfg = CLIPConfig.vit_b_32()
    params = init_clip(jax.random.key(0), cfg)
    # inference-style bf16 weights: skips the per-call fp32->bf16 cast of 151M params
    # (~600MB HBM reads per step; measured +2.7% throughput)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating) else x,
        params)

    BATCH = 256
    imgs = jax.random.normal(jax.random.key(1), (BATCH, 224, 224, 3), dtype=jnp.float32)

    enc = jax.jit(lambda p, x: encode_image(p, cfg, x, policy=BF16_POLICY,
                                            normalize=True))
    # warmup / compile (synced via host transfer)
    out = enc(params, imgs)
    _ = np.asarray(out)
    log("compiled")

    # the first post-compile iterations through the TPU runtime are ~15x slow
    # (pipeline warm-up, see .claude/skills/verify/SKILL.md) — warm them OUT of
    # the timed window instead of averaging them in
    for _ in range(5):
        out = enc(params, imgs)
    _ = np.asarray(out[0, 0])

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = enc(params, imgs)
    _ = np.asarray(out)  # in-order execution: syncing the last bounds all
    dt = (time.perf_counter() - t0) / iters
    img_s = BATCH / dt
    log(f"batch={BATCH} {dt*1e3:.2f} ms/iter -> {img_s:.0f} img/s")

    print(json.dumps({
        "metric": "CLIP ViT-B/32 image encode throughput (bf16, batch 256)",
        "value": round(img_s, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_s / REFERENCE_GPU_IMG_S, 2),
    }))


if __name__ == "__main__":
    main()

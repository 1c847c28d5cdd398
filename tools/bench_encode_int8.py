#!/usr/bin/env python
"""int8 serving encode throughput (ViT-B/32, batch 256) vs the bf16 path.

Prints one JSON line. The bf16 number is the BASELINE.md headline (bench.py);
this records the quantized serving configuration (models/clip/quant.py).
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
    from construction_clip_tpu.models.clip import init_clip, encode_image
    from construction_clip_tpu.models.clip.quant import (encode_image_int8,
                                                         quantize_clip)
    from construction_clip_tpu.core.precision import BF16_POLICY

    log(f"backend={jax.default_backend()}")
    cfg = CLIPConfig.vit_b_32()
    params = init_clip(jax.random.key(0), cfg)
    qp = quantize_clip(params)
    BATCH = 256
    imgs = jax.random.normal(jax.random.key(1), (BATCH, 224, 224, 3), jnp.float32)

    results = {}
    enc_q = jax.jit(lambda p, x: encode_image_int8(p, cfg, x, normalize=True))
    out = enc_q(qp, imgs)
    _ = np.asarray(out)
    log("int8 compiled")
    from bench_util import timed_windows, put_ms, put_rate

    for name, enc, pp in (("int8", enc_q, qp),):
        st = timed_windows(lambda: enc(pp, imgs), windows=5, iters=20,
                           sync=lambda o: np.asarray(o[0, 0]))
        put_rate(results, f"{name}_img_s", st, BATCH)
        put_ms(results, f"{name}_ms_batch", st)
        log(f"{name}: {st[0]*1e3:.2f} ms/batch [{st[1]*1e3:.2f},{st[2]*1e3:.2f}] "
            f"-> {BATCH/st[0]:.0f} img/s")

    # agreement vs the bf16 path on the same inputs
    pbf = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating) else x,
        params)
    enc_b = jax.jit(lambda p, x: encode_image(p, cfg, x, policy=BF16_POLICY,
                                              normalize=True))
    ref = np.asarray(enc_b(pbf, imgs[:32]), dtype=np.float32)
    got = np.asarray(enc_q(qp, imgs[:32]), dtype=np.float32)
    cos = (ref * got).sum(-1)
    results["cos_vs_bf16_min"] = round(float(cos.min()), 4)
    results["cos_vs_bf16_mean"] = round(float(cos.mean()), 4)
    log(f"cosine vs bf16: min {cos.min():.4f} mean {cos.mean():.4f}")

    print(json.dumps(results))


if __name__ == "__main__":
    main()

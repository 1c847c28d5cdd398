#!/usr/bin/env python
"""On-chip A/B: fused attention block fwd and fwd+bwd at the ViT-B/32 train
shape [128, 50, 768], pack=2 (default) vs pack forced off — does sample
packing actually move the kernel, and does the [T,T]-panel divide-fold help?

Run from /root/repo (axon). Prints one JSON line.
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

    from construction_clip_tpu.models.blocks import init_block
    from construction_clip_tpu.ops import pallas_attention_block as fab

    log(f"backend={jax.default_backend()}")
    B, T, D, H = 128, 50, 768, 12
    REP = 10
    key = jax.random.key(0)
    x = jax.random.normal(key, (B, T, D), jnp.bfloat16)
    p = init_block(jax.random.key(1), D, dtype=jnp.bfloat16)

    results = {"shape": f"B{B} T{T} D{D}"}

    def run_variant(tag, pack_off):
        orig = fab._pack_factor
        if pack_off:
            fab._pack_factor = lambda b, t: 1
        try:
            def fwd(x):
                return fab.fused_attention_block(
                    x, p["ln_1"], p["attn"], n_heads=H, causal=False, eps=1e-5)

            @jax.jit
            def chain_fwd(x0):
                def step(c, _):
                    return fwd(c).astype(x0.dtype), None
                out, _ = jax.lax.scan(step, x0, None, length=REP)
                return out.astype(jnp.float32).sum()

            @jax.jit
            def chain_vjp(x0):
                def step(c, _):
                    out, bwd = jax.vjp(fwd, c)
                    (dx,) = bwd(out)
                    return (c + 0.0 * dx).astype(x0.dtype), None
                out, _ = jax.lax.scan(step, x0, None, length=REP)
                return out.astype(jnp.float32).sum()

            for name, fn in (("fwd", chain_fwd), ("fwdbwd", chain_vjp)):
                st = timed_windows(lambda: fn(x), windows=5, iters=3, warmup=3)
                ms = put_ms(results, f"{tag}_{name}_ms",
                            (st[0] / REP, st[1] / REP, st[2] / REP), ndigits=3)
                log(f"{tag} {name}: {ms:.3f} ms")
        finally:
            fab._pack_factor = orig

    run_variant("packed", pack_off=False)
    run_variant("unpacked", pack_off=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

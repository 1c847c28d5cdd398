#!/usr/bin/env python
"""ViT-L/14 image-tower attribution at the config-5 hot shape (B=64, T=257,
D=1024, H=16, F=4096, bf16) — where do the 403 ms go, per sub-op, per impl?

T=257 is PRIME (256 patches + CLS): every [T, T] attention panel lane-pads
257 -> 384 (+49%) and sublane-pads 257 -> 264 in a Pallas kernel, so the
per-head flash path pays padding the T=50/77 towers never see. This tool
measures each candidate (Pallas flash vs XLA mha, fwd and fwd+bwd; MLP; QKV
GEMM; LN) as a scanned in-jit chain (one sync per window, per the tunnel
measurement rules) to decide where kernel work is warranted.

Usage: python tools/attr_vitl.py [--rep 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_util import log, put_ms, setup_jax_cache, timed_windows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rep", type=int, default=10)
    args = ap.parse_args()
    REP = args.rep

    import jax

    setup_jax_cache()
    import jax.numpy as jnp
    import numpy as np

    from construction_clip_tpu.ops import attention as attn_mod
    from construction_clip_tpu.ops.activations import quick_gelu
    from construction_clip_tpu.ops.norms import layer_norm

    B, T, D, H, F = 64, 257, 1024, 16, 4096
    dh = D // H
    key = jax.random.key(0)
    results = {"shape": f"B{B} T{T} D{D} H{H}"}
    log(f"backend={jax.default_backend()}")

    def chain(body, x0, extras=()):
        """REP dependent applications inside one jit; returns callable.

        The jitted fn reduces to a SCALAR: syncing a full [B,H,T,dh] output
        would drag ~17 MB through the ~30 MB/s tunnel per window and dominate
        the measurement (the v1 of this tool measured exactly that)."""

        @jax.jit
        def run(x0, *extras):
            def step(x, _):
                return body(x, *extras), None

            out, _ = jax.lax.scan(step, x0, None, length=REP)
            return out.astype(jnp.float32).sum()

        def fn():
            return run(x0, *extras)

        return fn

    def bench(name, body, x0, extras=(), iters=3):
        st = timed_windows(chain(body, x0, extras), windows=5, iters=iters,
                           warmup=3)
        ms = put_ms(results, name, (st[0] / REP, st[1] / REP, st[2] / REP),
                    ndigits=3)
        log(f"{name}: {ms:.3f} ms")
        return ms

    # ---- attention core [B, H, T, dh] ----
    q = jax.random.normal(key, (B, H, T, dh), jnp.bfloat16)
    kv = jax.random.normal(jax.random.key(1), (2, B, H, T, dh), jnp.bfloat16)

    def attn(impl):
        def body(x, kvp):
            return attn_mod.mha(x, kvp[0], kvp[1], impl=impl)

        return body

    for impl in ("pallas", "xla"):
        bench(f"attn_{impl}_fwd_ms", attn(impl), q, (kv,))

    # ---- attention-core composition ablations (what binds the 14 TF/s core:
    # MXU matmul shape, or the fp32 softmax between the two matmuls?) ----
    def attn_matmuls_only(x, kvp):
        # qk^T and (raw logits) @ v with NO softmax — pure MXU cost of the core
        s = dh ** -0.5
        logits = jnp.einsum("bhqd,bhkd->bhqk", x, kvp[0],
                            preferred_element_type=jnp.float32) * s
        return jnp.einsum("bhqk,bhkd->bhqd", logits.astype(x.dtype), kvp[1],
                          preferred_element_type=jnp.float32).astype(x.dtype)

    def attn_softmax_only(x, kvp):
        # softmax over a [B,H,T,T] panel built by broadcast (no matmuls):
        # isolates the exp/max/sum VPU+HBM cost XLA pays between the GEMMs
        panel = (x[..., :1] + kvp[0][..., :1].transpose(0, 1, 3, 2))
        p = jax.nn.softmax(panel, axis=-1)
        return (x + p[..., :1] * 0.0).astype(x.dtype)

    bench("attn_matmuls_only_ms", attn_matmuls_only, q, (kv,))
    bench("attn_softmax_only_ms", attn_softmax_only, q, (kv,))

    def attn_vjp(impl):
        def body(x, kvp):
            out, bwd = jax.vjp(
                lambda qq, kk, vv: attn_mod.mha(qq, kk, vv, impl=impl),
                x, kvp[0], kvp[1])
            dq, dk, dv = bwd(out)
            return (x + 0.0 * dq).astype(x.dtype)

        return body

    for impl in ("pallas", "xla"):
        bench(f"attn_{impl}_fwdbwd_ms", attn_vjp(impl), q, (kv,))

    # ---- QKV projection GEMM [B*T, D] @ [D, 3D] ----
    x2 = jax.random.normal(key, (B * T, D), jnp.bfloat16)
    wqkv = jax.random.normal(jax.random.key(2), (D, 3 * D), jnp.bfloat16) * 0.02

    def qkv_gemm(x, w):
        y = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return y[:, :D].astype(x.dtype)

    bench("qkv_gemm_fwd_ms", qkv_gemm, x2, (wqkv,))

    # ---- MLP [B*T, D] -> F -> D, QuickGELU ----
    w1 = jax.random.normal(jax.random.key(3), (D, F), jnp.bfloat16) * 0.02
    w2 = jax.random.normal(jax.random.key(4), (F, D), jnp.bfloat16) * 0.02

    def mlp(x, w1, w2):
        h = jax.lax.dot_general(x, w1, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        h = quick_gelu(h).astype(x.dtype)
        return jax.lax.dot_general(h, w2, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32
                                   ).astype(x.dtype)

    bench("mlp_fwd_ms", mlp, x2, (w1, w2))

    def mlp_vjp(x, w1, w2):
        out, bwd = jax.vjp(lambda a, b, c: mlp(a, b, c), x, w1, w2)
        dx, dw1, dw2 = bwd(out)
        return (x + 0.0 * dx).astype(x.dtype)

    bench("mlp_fwdbwd_ms", mlp_vjp, x2, (w1, w2))

    # ---- LN [B, T, D] ----
    x3 = jax.random.normal(key, (B, T, D), jnp.bfloat16)
    scale = jnp.ones((D,), jnp.float32)
    bias = jnp.zeros((D,), jnp.float32)
    bench("ln_fwd_ms", lambda x, s, b: layer_norm(x, s, b).astype(x.dtype),
          x3, (scale, bias), iters=5)

    # ---- whole pre-norm attention block (models/blocks path) ----
    from construction_clip_tpu.models import blocks

    params = {
        "ln_1": {"scale": scale, "bias": bias},
        "ln_2": {"scale": scale, "bias": bias},
        "attn": {
            "w_qkv": wqkv, "b_qkv": jnp.zeros((3 * D,), jnp.bfloat16),
            "w_out": jax.random.normal(jax.random.key(5), (D, D),
                                       jnp.bfloat16) * 0.02,
            "b_out": jnp.zeros((D,), jnp.bfloat16),
        },
        "mlp": {"w_fc": w1, "b_fc": jnp.zeros((F,), jnp.bfloat16),
                "w_proj": w2, "b_proj": jnp.zeros((D,), jnp.bfloat16)},
    }

    def block(x, p):
        return blocks.apply_block(p, x, n_heads=H, act=quick_gelu)

    def block_vjp(x, p):
        out, bwd = jax.vjp(lambda xx: block(xx, p), x)
        (dx,) = bwd(out)
        return (x + 0.0 * dx).astype(x.dtype)

    for impl in ("pallas", "xla"):
        attn_mod.set_impl(impl)
        bench(f"block_{impl}_fwd_ms", block, x3, (params,))
        bench(f"block_{impl}_fwdbwd_ms", block_vjp, x3, (params,))
    attn_mod.set_impl("pallas" if jax.default_backend() == "tpu" else "xla")

    print(json.dumps(results))


if __name__ == "__main__":
    main()

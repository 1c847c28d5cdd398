#!/usr/bin/env python
"""int8 encode attribution at the serving shape (ViT-B/32, b=256, T=50, bf16
activations, int8 GEMMs) — where does the int8 batch go, and what is the int8
ceiling of this shape?

The bf16 encode row has a per-term attribution + floor statement in BASELINE.md
(attention chain 0.78 ms/layer at 42% MFU, MLP 0.786 at 78%, ceiling ~16
ms/batch); this tool gives the int8 row the same rigor (VERDICT round-4 weak
#5): per-layer int8 attention block vs int8 MLP vs patch-embed/proj fractions,
GEMM-only int8 floors at the exact serving shapes, and the implied ceiling.

Reference workload: `clip.load("ViT-B/32")` image encode
(/root/reference/CLIP/predict.py:33); the int8 path is this framework's
serving configuration (models/clip/quant.py — the reference has none).

All bodies are REP-chained inside one jit (one sync per window) per the
tunnel measurement rules (.claude/skills/verify/SKILL.md). Prints one JSON
line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from bench_util import log, put_ms, setup_jax_cache, timed_windows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rep", type=int, default=10)
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()
    REP = args.rep

    import jax

    setup_jax_cache()
    import jax.numpy as jnp
    import numpy as np

    from construction_clip_tpu.core.configs import CLIPConfig
    from construction_clip_tpu.models.clip import init_clip
    from construction_clip_tpu.models.clip.quant import (_attn_residual_q,
                                                         encode_image_int8,
                                                         quantize_clip)
    from construction_clip_tpu.ops.activations import quick_gelu
    from construction_clip_tpu.ops.norms import layer_norm
    from construction_clip_tpu.ops.quant import int8_linear

    cfg = CLIPConfig.vit_b_32()
    v = cfg.vision
    B, T, D, H, F = args.batch, 50, v.width, v.heads, 4 * v.width
    results = {"shape": f"B{B} T{T} D{D} H{H} F{F}"}
    log(f"backend={jax.default_backend()}")

    params = init_clip(jax.random.key(0), cfg)
    qp = quantize_clip(params)
    layer0 = jax.tree.map(lambda z: z[0], qp["vision"]["blocks"])

    key = jax.random.key(1)
    x0 = jax.random.normal(key, (B, T, D), jnp.bfloat16)

    def chain(body, x0, extras=()):
        """REP dependent applications in one jit, reduced to a scalar."""

        @jax.jit
        def run(x0, *extras):
            def step(x, _):
                return body(x, *extras), None

            out, _ = jax.lax.scan(step, x0, None, length=REP)
            return out.astype(jnp.float32).sum()

        return lambda: run(x0, *extras)

    def bench(name, body, x0, extras=(), iters=3):
        st = timed_windows(chain(body, x0, extras), windows=5, iters=iters,
                           warmup=3)
        ms = put_ms(results, name, (st[0] / REP, st[1] / REP, st[2] / REP),
                    ndigits=3)
        log(f"{name}: {ms:.3f} ms")
        return ms

    # ---- whole int8 layer (attention block + MLP), the scan body ----
    def layer_body(x, lp):
        h = _attn_residual_q(x, lp["ln_1"], lp["attn"], H)
        y = layer_norm(h, **lp["ln_2"])
        y = quick_gelu(int8_linear(y, lp["mlp"]["w_fc"]["q"],
                                   lp["mlp"]["w_fc"]["s"], lp["mlp"]["b_fc"],
                                   out_dtype=jnp.bfloat16))
        return h + int8_linear(y, lp["mlp"]["w_proj"]["q"],
                               lp["mlp"]["w_proj"]["s"], lp["mlp"]["b_proj"],
                               out_dtype=jnp.bfloat16)

    layer_ms = bench("int8_layer_ms", layer_body, x0, (layer0,))

    # ---- int8 attention residual alone (fused Pallas int8 block) ----
    def attn_body(x, lp):
        return _attn_residual_q(x, lp["ln_1"], lp["attn"], H)

    attn_ms = bench("int8_attn_block_ms", attn_body, x0, (layer0,))

    # ---- int8 MLP half alone ----
    def mlp_body(x, lp):
        y = layer_norm(x, **lp["ln_2"])
        y = quick_gelu(int8_linear(y, lp["mlp"]["w_fc"]["q"],
                                   lp["mlp"]["w_fc"]["s"], lp["mlp"]["b_fc"],
                                   out_dtype=jnp.bfloat16))
        return x + int8_linear(y, lp["mlp"]["w_proj"]["q"],
                               lp["mlp"]["w_proj"]["s"], lp["mlp"]["b_proj"],
                               out_dtype=jnp.bfloat16)

    mlp_ms = bench("int8_mlp_ms", mlp_body, x0, (layer0,))

    # ---- GEMM-only int8 floors at the exact per-layer shapes ----
    # flat [B*T, D] rows (the kernels flatten the same way); each body keeps
    # the chain dependent by projecting back to the input shape
    flat = jax.random.normal(key, (B * T, D), jnp.bfloat16)

    def gemm_floor(name, wq_leaf, in_dim, out_dim):
        def body(x, lp):
            y = int8_linear(x[:, :in_dim], wq_leaf(lp)["q"],
                            wq_leaf(lp)["s"], out_dtype=jnp.bfloat16)
            return jnp.concatenate(
                [y[:, :min(out_dim, D)],
                 x[:, min(out_dim, D):]], axis=-1) if out_dim < D else y[:, :D]

        return bench(name, body, flat, (layer0,))

    qkv_ms = gemm_floor("int8_gemm_qkv_ms",
                        lambda lp: lp["attn"]["w_qkv"], D, 3 * D)
    out_ms = gemm_floor("int8_gemm_out_ms",
                        lambda lp: lp["attn"]["w_out"], D, D)
    fc_ms = gemm_floor("int8_gemm_fc_ms", lambda lp: lp["mlp"]["w_fc"], D, F)

    def proj_body(x, lp):
        y = int8_linear(jnp.concatenate([x, x, x, x], axis=-1),
                        lp["mlp"]["w_proj"]["q"], lp["mlp"]["w_proj"]["s"],
                        out_dtype=jnp.bfloat16)
        return y

    proj_ms = bench("int8_gemm_proj_ms", proj_body, flat, (layer0,))

    # ---- SAME-WINDOW bf16 A/B (tunnel weather shifts absolute numbers
    # run-to-run; the int8-vs-bf16 delta is only honest measured in one
    # window — BASELINE.md "Decode-row provenance" discipline) ----
    from construction_clip_tpu.core.precision import BF16_POLICY
    from construction_clip_tpu.models.blocks import apply_block
    from construction_clip_tpu.models.clip import encode_image
    from construction_clip_tpu.ops.activations import quick_gelu as qg

    blayer0 = jax.tree.map(
        lambda z: z[0].astype(jnp.bfloat16) if jnp.issubdtype(
            z.dtype, jnp.floating) else z[0],
        params["vision"]["blocks"])

    def bf16_layer_body(x, lp):
        return apply_block(lp, x, n_heads=H, act=qg)

    bf16_layer_ms = bench("bf16_layer_ms", bf16_layer_body, x0, (blayer0,))

    # ---- whole-model encodes for the end-to-end fractions ----
    imgs = jax.random.normal(jax.random.key(2), (B, 224, 224, 3), jnp.float32)
    enc_q = jax.jit(lambda p, x: encode_image_int8(p, cfg, x, normalize=True))
    np.asarray(enc_q(qp, imgs))
    st = timed_windows(lambda: enc_q(qp, imgs), windows=5, iters=10,
                       sync=lambda o: np.asarray(o[0, 0]))
    total_ms = put_ms(results, "int8_encode_ms_batch", st, ndigits=2)
    log(f"int8 whole encode: {total_ms:.2f} ms/batch "
        f"({B / st[0]:.0f} img/s)")

    enc_bf = jax.jit(lambda p, x: encode_image(p, cfg, x, policy=BF16_POLICY,
                                               normalize=True))
    np.asarray(enc_bf(params, imgs))
    st = timed_windows(lambda: enc_bf(params, imgs), windows=5, iters=10,
                       sync=lambda o: np.asarray(o[0, 0]))
    bf16_total_ms = put_ms(results, "bf16_encode_ms_batch", st, ndigits=2)
    results["int8_speedup_vs_bf16_same_window"] = round(
        bf16_total_ms / total_ms, 3)
    log(f"bf16 whole encode (same window): {bf16_total_ms:.2f} ms/batch "
        f"({B / st[0]:.0f} img/s); int8 speedup x"
        f"{bf16_total_ms / total_ms:.3f}")

    # ---- derived attribution ----
    layers_ms = 12 * layer_ms
    rest_ms = total_ms - layers_ms  # patchify + patch-embed + LNs + proj + norm
    gemms_ms = qkv_ms + out_ms + fc_ms + proj_ms
    attn_chain_ms = attn_ms - (qkv_ms + out_ms)  # per-head math + softmax + LN
    results.update({
        "derived_layers12_ms": round(layers_ms, 2),
        "derived_rest_ms": round(rest_ms, 2),
        "derived_attn_chain_ms": round(attn_chain_ms, 3),
        "derived_gemms_per_layer_ms": round(gemms_ms, 3),
        "frac_attn_block": round(12 * attn_ms / total_ms, 3),
        "frac_mlp": round(12 * mlp_ms / total_ms, 3),
        "frac_attn_chain_nongemm": round(12 * attn_chain_ms / total_ms, 3),
        "frac_rest": round(rest_ms / total_ms, 3),
    })
    # int8 GEMM utilization: MACs per layer GEMM set = B*T*(D*3D + D*D + 2*D*F)
    macs = B * T * (D * 3 * D + D * D + 2 * D * F)
    tops = 2 * macs / (gemms_ms * 1e-3) / 1e12
    results["int8_gemm_tops"] = round(tops, 1)
    # implied ceiling: GEMMs at the best measured int8 rate (439 TOP/s) +
    # the non-GEMM chain as measured
    ceiling_ms = 12 * (2 * macs / 439e12 * 1e3 + attn_chain_ms
                       + (mlp_ms - fc_ms - proj_ms)) + rest_ms
    results["implied_ceiling_ms"] = round(ceiling_ms, 2)
    log(f"attribution: 12x layer {layers_ms:.2f} ms "
        f"(attn {12*attn_ms:.2f} = gemms {12*(qkv_ms+out_ms):.2f} + chain "
        f"{12*attn_chain_ms:.2f}; mlp {12*mlp_ms:.2f}) + rest {rest_ms:.2f}; "
        f"GEMMs at {tops:.0f} TOP/s; implied ceiling {ceiling_ms:.1f} ms")

    print(json.dumps(results))


if __name__ == "__main__":
    main()

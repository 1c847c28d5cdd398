#!/usr/bin/env python
"""On-chip A/B for the attention-backward grad-matmul floor (round-4 item):
per-head chain (current production structure, `pallas_attention_block._bwd_kernel`)
vs HEAD-PAIR LANE PACKING of the four dh-wide-output grad matmuls.

Hypothesis being falsified: the ~27 ms attention backward at the contrastive
shape is a SHAPE floor of per-(batch,head) matmuls. The round-3 sample-packing
A/B showed cost tracks sublane-strips x lane-tiles, NOT matmul count — and by
that model 4 of the 6 per-head matmuls (out = P@V recompute, dV = P^T@dO,
dQ = dS@K, dK = dS^T@Q) waste HALF their output lanes (dh=64 of 128). Pairing
heads as  [A_h1 | A_h2] @ blockdiag(B_h1, B_h2)  fills the 128 output lanes at
the SAME strip count -> those four matmuls go 2x. logits/dP keep full-lane
outputs already (T-wide) and stay per-head. Price: T must be padded to a
64-multiple so the in-kernel concats are sublane/lane aligned (Mosaic rejects
unaligned concats), so T=50 pays a 50->64 row tax on everything.

Strip-model prediction at [128, 50, 768] H=12: core 12x7 strips -> 8x8 = 0.76x.

Run from /root/repo (axon). Prints one JSON line.
"""
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_util import log, put_ms, setup_jax_cache, timed_windows

NEG_INF = -1e9
INTERPRET = os.environ.get("AB_INTERPRET") == "1"  # CPU math check, no timing


def _perhead_kernel(qkv_ref, dmg_ref, dqkv_ref, merged_ref, *, n_heads: int,
                    t_valid: int):
    """The production backward's attention core verbatim (per-head batched
    dots; cf. pallas_attention_block._bwd_kernel:231-267) minus LN/weight
    GEMMs, with a padded-column mask so both variants run padded shapes."""
    import jax
    import jax.numpy as jnp

    bt, t, d3 = qkv_ref.shape
    d = d3 // 3
    dh = d // n_heads
    dtype = qkv_ref.dtype
    scale = dh ** -0.5
    qkv = qkv_ref[:]
    dmerged = dmg_ref[:]
    colmask = (jax.lax.broadcasted_iota(jnp.int32, (t, t), 1) < t_valid)[None] \
        if t != t_valid else None

    outs, dqs, dks, dvs = [], [], [], []
    for head in range(n_heads):
        off = head * dh
        q = qkv[:, :, off: off + dh]
        k = qkv[:, :, d + off: d + off + dh]
        v = qkv[:, :, 2 * d + off: 2 * d + off + dh]
        logits = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        if colmask is not None:
            logits = jnp.where(colmask, logits, NEG_INF)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        p_lo = p.astype(dtype)
        outs.append(jax.lax.dot_general(
            p_lo, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dtype))
        dmg = dmerged[:, :, off: off + dh]
        dp = jax.lax.dot_general(
            dmg, v, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dvs.append(jax.lax.dot_general(
            p_lo, dmg, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dtype))
        ds = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * scale
              ).astype(dtype)
        dqs.append(jax.lax.dot_general(
            ds, k, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dtype))
        dks.append(jax.lax.dot_general(
            ds, q, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dtype))
    merged_ref[:] = jnp.concatenate(outs, axis=-1)
    dqkv_ref[:] = jnp.concatenate(dqs + dks + dvs, axis=-1)


def _paired_kernel(qkv_ref, dmg_ref, dqkv_ref, merged_ref, *, n_heads: int,
                   t_valid: int):
    """Head-pair variant: logits/softmax/dP stay per-head (their outputs are
    already T-wide = full lanes); out/dV/dQ/dK run per PAIR as
    [A_h1 | A_h2] [bt, T, 2T] @ blockdiag(B_h1, B_h2) [bt, 2T, 2dh]
    so the 2dh=128 output lanes are fully used. Requires T % 64 == 0 for
    aligned concats."""
    import jax
    import jax.numpy as jnp

    bt, t, d3 = qkv_ref.shape
    d = d3 // 3
    dh = d // n_heads
    dtype = qkv_ref.dtype
    scale = dh ** -0.5
    qkv = qkv_ref[:]
    dmerged = dmg_ref[:]
    colmask = (jax.lax.broadcasted_iota(jnp.int32, (t, t), 1) < t_valid)[None] \
        if t != t_valid else None
    zpad = jnp.zeros((bt, t, dh), dtype)

    def blockdiag(b1, b2):  # [bt, t, dh] x2 -> [bt, 2t, 2dh]
        return jnp.concatenate([jnp.concatenate([b1, zpad], axis=2),
                                jnp.concatenate([zpad, b2], axis=2)], axis=1)

    outs, dqs, dks, dvs = [], [], [], []
    for pair in range(n_heads // 2):
        p_lo2, ds2, kq2 = [], [], []
        for head in (2 * pair, 2 * pair + 1):
            off = head * dh
            q = qkv[:, :, off: off + dh]
            k = qkv[:, :, d + off: d + off + dh]
            v = qkv[:, :, 2 * d + off: 2 * d + off + dh]
            logits = jax.lax.dot_general(
                q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32) * scale
            if colmask is not None:
                logits = jnp.where(colmask, logits, NEG_INF)
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            p_lo2.append(p.astype(dtype))
            dmg = dmerged[:, :, off: off + dh]
            dp = jax.lax.dot_general(
                dmg, v, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            ds2.append((p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
                        * scale).astype(dtype))
            kq2.append((q, k, v, dmg))
        (q1, k1, v1, dmg1), (q2, k2, v2, dmg2) = kq2
        p_cat = jnp.concatenate(p_lo2, axis=2)          # [bt, T, 2T] lanes-cat
        ds_cat = jnp.concatenate(ds2, axis=2)
        p_stack = jnp.concatenate(p_lo2, axis=1)        # [bt, 2T, T] rows-cat
        ds_stack = jnp.concatenate(ds2, axis=1)
        v_bd = blockdiag(v1, v2)                        # [bt, 2T, 128]
        k_bd = blockdiag(k1, k2)
        q_bd = blockdiag(q1, q2)
        dmg_bd = blockdiag(dmg1, dmg2)
        # out_pair = [P1@V1 | P2@V2]: contract p_cat lanes (2T) vs v_bd rows;
        # the blockdiag zeros kill the cross-head terms
        out2 = jax.lax.dot_general(
            p_cat, v_bd, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dtype)   # [bt, T, 128]
        dq2 = jax.lax.dot_general(
            ds_cat, k_bd, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dtype)
        # dv_pair = [P1^T@dO1 | P2^T@dO2]: contract the stacked 2T q-rows of
        # p_stack against dmg_bd's 2T rows (blockdiag again kills cross terms)
        dv2 = jax.lax.dot_general(
            p_stack, dmg_bd, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dtype)   # [bt, T, 128]
        dk2 = jax.lax.dot_general(
            ds_stack, q_bd, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dtype)
        outs.extend([out2[:, :, :dh], out2[:, :, dh:]])
        dqs.extend([dq2[:, :, :dh], dq2[:, :, dh:]])
        dvs.extend([dv2[:, :, :dh], dv2[:, :, dh:]])
        dks.extend([dk2[:, :, :dh], dk2[:, :, dh:]])
    merged_ref[:] = jnp.concatenate(outs, axis=-1)
    dqkv_ref[:] = jnp.concatenate(dqs + dks + dvs, axis=-1)


def main():
    import jax

    if INTERPRET:
        jax.config.update("jax_platforms", "cpu")
    setup_jax_cache()
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    log(f"backend={jax.default_backend()}")
    results = {}

    def build(kernel_fn, b, t, d, h, bt, t_valid, dtype=jnp.bfloat16):
        grid = (b // bt,)
        tile = lambda w: pl.BlockSpec((bt, t, w), lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM)
        return pl.pallas_call(
            functools.partial(kernel_fn, n_heads=h, t_valid=t_valid),
            out_shape=(jax.ShapeDtypeStruct((b, t, 3 * d), dtype),
                       jax.ShapeDtypeStruct((b, t, d), dtype)),
            grid=grid,
            in_specs=[tile(3 * d), tile(d)],
            out_specs=(tile(3 * d), tile(d)),
            interpret=INTERPRET,
        )

    shapes = (("img", (128, 50, 768, 12)), ("txt", (128, 77, 512, 8)))
    if INTERPRET:
        shapes = (("img", (4, 50, 768, 12)), ("txt", (4, 77, 512, 8)))
    for shape_tag, (B, T, D, H) in shapes:
        TP = -(-T // 64) * 64  # pair variant needs 64-aligned T
        key = jax.random.key(0)
        qkv = jax.random.normal(key, (B, T, 3 * D), jnp.bfloat16)
        dmg = jax.random.normal(jax.random.key(1), (B, T, D), jnp.bfloat16)

        def padded(x):
            return jnp.pad(x, ((0, 0), (0, TP - T), (0, 0)))

        variants = {}
        for tag, kern, t_run, prep in (
                ("perhead", _perhead_kernel, T, lambda x: x),
                ("paired", _paired_kernel, TP, padded)):
            for bt in (8, 4, 2, 1):
                if B % bt:
                    continue
                try:
                    call = build(kern, B, t_run, D, H, bt, T)
                    dqkv, merged = jax.jit(
                        lambda a, b, c=call, p=prep: c(p(a), p(b)))(qkv, dmg)
                    import numpy as np
                    np.asarray(merged)  # force execution
                    variants[tag] = (call, prep, bt)
                    log(f"{shape_tag} {tag}: bt={bt} compiles+runs")
                    break
                except Exception as e:
                    log(f"{shape_tag} {tag} bt={bt}: "
                        f"{type(e).__name__}: {str(e)[:200]}")
        if "perhead" not in variants or "paired" not in variants:
            results[f"{shape_tag}_status"] = "variant failed to build"
            continue

        # numerics: paired (unpadded slice) must match perhead
        import numpy as np
        call_a, prep_a, _ = variants["perhead"]
        call_b, prep_b, _ = variants["paired"]
        da, ma = jax.jit(lambda a, b: call_a(prep_a(a), prep_a(b)))(qkv, dmg)
        db, mb = jax.jit(lambda a, b: call_b(prep_b(a), prep_b(b)))(qkv, dmg)
        err_d = float(jnp.max(jnp.abs(da.astype(jnp.float32)
                                      - db[:, :T].astype(jnp.float32))))
        err_m = float(jnp.max(jnp.abs(ma.astype(jnp.float32)
                                      - mb[:, :T].astype(jnp.float32))))
        results[f"{shape_tag}_max_abs_err"] = max(err_d, err_m)
        log(f"{shape_tag} parity: dqkv {err_d:.2e} merged {err_m:.2e}")
        if INTERPRET:
            continue

        REP = 10
        for tag, (call, prep, bt) in variants.items():
            @jax.jit
            def chain(q0, g0, call=call, prep=prep):
                def step(c, _):
                    dq, mg = call(prep(q0 + 0.0 * c[:, :, :1]), prep(g0))
                    return c + 0.0 * dq[:, :T].astype(c.dtype), None
                out, _ = jax.lax.scan(step, q0, None, length=REP)
                return out.astype(jnp.float32).sum()

            st = timed_windows(lambda: chain(qkv, dmg), windows=5, iters=3,
                               warmup=3)
            ms = put_ms(results, f"{shape_tag}_{tag}_ms",
                        (st[0] / REP, st[1] / REP, st[2] / REP), ndigits=3)
            log(f"{shape_tag} {tag} (bt={bt}): {ms:.3f} ms")
    print(json.dumps(results))


if __name__ == "__main__":
    main()

"""GPT-2 decoder (HF-compatible), functional JAX, with an HBM KV-cache decode path.

The reference's captioner wraps `GPT2LMHeadModel.from_pretrained('ckiplab/gpt2-base-chinese')`
(reference CLIP_prefix_caption/train.py:275) and, at generation time, re-runs the FULL
growing sequence through the model at every step (reference test.py:380-381 — no KV
cache, O(n^2) per caption). Here the decoder is designed for TPU generation from the
start:

  - layers stacked for lax.scan (one compiled block regardless of depth);
  - a static-shape KV cache [L, B, H, T_max, Dh] living in HBM, updated in place via
    dynamic_update_slice under jit — decode steps are O(n) and fully jittable inside
    lax.while_loop / lax.scan (see infer/decode.py);
  - `inputs_embeds` front door (the ClipCap prefix is injected as embeddings, matching
    reference train.py:263's concat of [prefix, attribute, token] embeddings).

Weight layout note: HF GPT-2 uses Conv1D ([in, out]) for c_attn/c_proj/c_fc — already
input-major, so the converter copies them without transposition.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from construction_clip_tpu.core.configs import GPT2Config
from construction_clip_tpu.core.precision import Policy, DEFAULT_POLICY
from construction_clip_tpu.ops.activations import gelu_new
from construction_clip_tpu.ops.attention import split_heads, merge_heads
from construction_clip_tpu.ops.norms import layer_norm


class KVCache(NamedTuple):
    k: jax.Array  # [L, B, H, T_max, Dh]
    v: jax.Array  # [L, B, H, T_max, Dh]
    length: jax.Array  # int32 scalar: number of valid positions

    @staticmethod
    def create(cfg: GPT2Config, batch: int, max_len: int, dtype=jnp.float32) -> "KVCache":
        dh = cfg.n_embd // cfg.n_head
        shape = (cfg.n_layer, batch, cfg.n_head, max_len, dh)
        return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype),
                       length=jnp.zeros((), jnp.int32))


def init_gpt2(key, cfg: GPT2Config, dtype=jnp.float32):
    ks = jax.random.split(key, 6)
    d, h = cfg.n_embd, 4 * cfg.n_embd

    def dense(k, i, o, std=0.02):
        return (jax.random.normal(k, (i, o)) * std).astype(dtype)

    def block(k):
        k1, k2, k3, k4 = jax.random.split(k, 4)
        return {
            "ln_1": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
            "attn": {
                "c_attn_w": dense(k1, d, 3 * d), "c_attn_b": jnp.zeros((3 * d,), dtype),
                "c_proj_w": dense(k2, d, d), "c_proj_b": jnp.zeros((d,), dtype),
            },
            "ln_2": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
            "mlp": {
                "c_fc_w": dense(k3, d, h), "c_fc_b": jnp.zeros((h,), dtype),
                "c_proj_w": dense(k4, h, d), "c_proj_b": jnp.zeros((d,), dtype),
            },
        }

    blocks = [block(k) for k in jax.random.split(ks[0], cfg.n_layer)]
    return {
        "wte": dense(ks[1], cfg.vocab_size, cfg.n_embd),
        "wpe": (jax.random.normal(ks[2], (cfg.n_positions, cfg.n_embd)) * 0.01).astype(dtype),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "ln_f": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
    }




def _train_unroll(stacked, remat: bool = False) -> int:
    """Full scan unroll on TPU for the uncached (training/prefill) paths —
    measured on v5e ViT-B shapes: XLA optimizes layouts across unrolled layers
    (fwd+bwd -24%; partial unroll is WORSE than none — see models/blocks.py).
    Under remat the direction reverses: unroll=1 keeps a per-layer backward
    schedule (measured on the ViT-L/14 remat step, models/blocks.py note).
    The cached decode scan is NOT unrolled: its per-step program is latency-
    bound elsewhere and unrolling only bloats the while_loop body."""
    import jax as _jax

    n = _jax.tree.leaves(stacked)[0].shape[0]
    return n if (_jax.default_backend() == "tpu" and not remat) else 1


def _linear(h, w, b):
    """y = h @ W + b, dispatching on the weight leaf: plain array (bf16/fp32
    matmul) or {"q": int8, "s": fp32} from quantize_gpt2 (int8 MXU matmul with
    dynamic per-row activation quant — ops/quant.py). Weight-only int8 halves
    the per-step HBM weight reads that bound batched decode."""
    if isinstance(w, dict):
        from construction_clip_tpu.ops.quant import int8_linear

        return int8_linear(h, w["q"], w["s"], b, out_dtype=h.dtype)
    return h @ w + b


def quantize_gpt2(params, dtype=jnp.bfloat16):
    """Inference-quantized GPT-2 params: the four block GEMM weights and a
    transposed logits copy of wte become int8 {"q","s"} leaves; other float
    leaves are cast to `dtype`. wte itself stays float for embedding lookups.
    gpt2_forward detects the structure and skips the policy cast."""
    from construction_clip_tpu.ops.quant import quantize_tree

    p = jax.tree.map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating) else x,
        params)
    p = quantize_tree(p, (
        ("blocks", "attn", "c_attn_w"),
        ("blocks", "attn", "c_proj_w"),
        ("blocks", "mlp", "c_fc_w"),
        ("blocks", "mlp", "c_proj_w"),
    ))
    from construction_clip_tpu.ops.quant import quantize_weight

    wq, ws = quantize_weight(params["wte"].T, axis=0)  # [n_embd, vocab]
    p["wte_logits"] = {"q": wq, "s": ws}
    return p


def _is_quantized(params) -> bool:
    return isinstance(params["blocks"]["attn"]["c_attn_w"], dict)


def _lm_logits(p, x):
    if "wte_logits" in p:
        from construction_clip_tpu.ops.quant import int8_linear

        return int8_linear(x, p["wte_logits"]["q"], p["wte_logits"]["s"],
                           out_dtype=jnp.float32)
    return (x @ p["wte"].T).astype(jnp.float32)


UNROLL_DECODE = False  # measured on v5e (tools/attr_decode A/B): the scan
#   WINS — 29.9k vs 28.4k tok/s greedy B=32, 2685 vs 2193 B=1. XLA fuses the
#   scan's dynamic_index cache slice (no copy materializes); unrolling only
#   bloats the program. Kept as an A/B flag.
DECODE_ATTN_KERNEL = False  # t==1 attention via ops/pallas_decode_attention


def _attn_uncached(q, k, v, attn_bias, return_probs: bool = False):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits *= q.shape[-1] ** -0.5
    t = q.shape[2]
    q_pos = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    k_pos = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    logits = jnp.where(q_pos >= k_pos, logits, jnp.finfo(jnp.float32).min)
    if attn_bias is not None:
        logits = logits + attn_bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    return out, (probs if return_probs else None)


def _attn_over_cache(q, ck, cv, cache_len, attn_bias, ancestry=None):
    """q [B,H,t,Dh] over the (already-updated) full cache window [B,H,T_max,Dh]
    with validity+causal masking.

    t==1 (the decode step) takes a multiply-reduce path instead of dot_general:
    M=1 batched matmuls lower to ~B*H latency-bound MXU dispatches, while the
    broadcastal q*k sum and p*v sum fuse into two VPU kernels.

    ancestry: optional [B, T_max] int32 row indices for LAZY beam-search cache
    reorder — query row i attends to cache row ancestry[i, t] at position t
    (its beam's ancestor at that step) instead of its own row. The gather fuses
    into the attention reduce, so beam ancestry costs ~one cache read instead
    of the read+write of physically reordering [L,B,H,T,Dh] every step
    (infer/decode.py beam_decode; reference semantics test.py:395-421)."""
    t_new = q.shape[2]
    t_max = ck.shape[2]
    if t_new == 1:
        if ancestry is not None:
            idx = ancestry[:, None, :, None]  # [B,1,T,1] -> broadcast over H, Dh
            ck = jnp.take_along_axis(ck, idx, axis=0)
            cv = jnp.take_along_axis(cv, idx, axis=0)
        qf = q[:, :, 0, :].astype(jnp.float32) * (q.shape[-1] ** -0.5)
        logits = jnp.sum(qf[:, :, None, :] * ck.astype(jnp.float32), axis=-1)
        k_pos = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 2)
        logits = jnp.where(k_pos <= cache_len, logits, jnp.finfo(jnp.float32).min)
        if attn_bias is not None:
            b32 = attn_bias.astype(jnp.float32)
            if b32.ndim >= 2:
                b32 = b32[..., 0, :]  # drop the t==1 query axis
            logits = logits + b32
        probs = jax.nn.softmax(logits, axis=-1)                      # [B,H,T]
        out = jnp.sum(probs[..., None] * cv.astype(jnp.float32), axis=2)
        return out[:, :, None, :].astype(q.dtype)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, ck.astype(q.dtype),
                        preferred_element_type=jnp.float32)
    logits *= q.shape[-1] ** -0.5
    q_pos = cache_len + jax.lax.broadcasted_iota(jnp.int32, (t_new, t_max), 0)
    k_pos = jax.lax.broadcasted_iota(jnp.int32, (t_new, t_max), 1)
    logits = jnp.where(q_pos >= k_pos, logits, jnp.finfo(jnp.float32).min)
    if attn_bias is not None:
        logits = logits + attn_bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(q.dtype), cv.astype(q.dtype),
                      preferred_element_type=jnp.float32).astype(q.dtype)


def apply_block_uncached(lp, h, attn_bias, cfg: GPT2Config, *,
                         return_probs: bool = False):
    """One pre-norm GPT-2 block on [B, T, D] — the training/uncached math,
    shared by gpt2_forward's layer scan and the pipeline-parallel stage
    (parallel/pipeline.py applies a stage's block slice with this exact
    function so PP is numerically the single-device forward)."""
    n_heads = cfg.n_head
    y = layer_norm(h, **lp["ln_1"], eps=cfg.layer_norm_epsilon)
    qkv = _linear(y, lp["attn"]["c_attn_w"], lp["attn"]["c_attn_b"])
    q, k, v = (split_heads(z, n_heads) for z in jnp.split(qkv, 3, axis=-1))
    out, probs = _attn_uncached(q, k, v, attn_bias, return_probs=return_probs)
    h = h + _linear(merge_heads(out), lp["attn"]["c_proj_w"],
                    lp["attn"]["c_proj_b"])
    y = layer_norm(h, **lp["ln_2"], eps=cfg.layer_norm_epsilon)
    y = gelu_new(_linear(y, lp["mlp"]["c_fc_w"], lp["mlp"]["c_fc_b"]))
    h = h + _linear(y, lp["mlp"]["c_proj_w"], lp["mlp"]["c_proj_b"])
    return h, probs


def gpt2_forward(
    params,
    cfg: GPT2Config,
    *,
    tokens: Optional[jax.Array] = None,
    inputs_embeds: Optional[jax.Array] = None,
    attn_bias: Optional[jax.Array] = None,
    cache: Optional[KVCache] = None,
    cache_ancestry: Optional[jax.Array] = None,
    policy: Policy = DEFAULT_POLICY,
    remat: bool = False,
    return_probs: bool = False,
):
    """Returns (logits [B,T,V], new_cache | None) — or, with return_probs=True
    (uncached path only), (logits, probs [L,B,H,T,T]) for the decoder attention-map
    figure (reference CLIP_prefix_caption/test.py:342-350,383-390 captures last-layer
    attention per generated step).

    tokens XOR inputs_embeds. With a cache, positions start at cache.length (the new
    tokens are appended). attn_bias: additive, broadcastable to [B,H,T_q,T_k]
    (T_k = T_q for multi-token calls, cache T_max for t==1 steps).

    Multi-token cached calls are PREFILL-ONLY: they assume cache.length == 0
    (a fresh cache) and attend within the chunk; appending a multi-token chunk
    to a non-empty cache is unsupported (no caller does it — see layer_body's
    prefill note for the TPU fault that also makes the windowed read unsafe).
    """
    p = params if _is_quantized(params) else policy.cast_to_compute(params)
    if inputs_embeds is None:
        x = p["wte"][tokens]
    else:
        x = inputs_embeds.astype(policy.compute_dtype)
    start = cache.length if cache is not None else 0
    t = x.shape[1]
    positions = start + jnp.arange(t)
    x = x + p["wpe"][positions]

    n_heads = cfg.n_head

    if cache is not None:
        # Cache rides the scan CARRY and is updated in place: each layer writes
        # only its t new (k, v) rows via dynamic_update_slice on the carried
        # [L,B,H,T_max,Dh] buffers (XLA aliases scan/while carries, so per decode
        # step the HBM writes are ~L*B*H*t*Dh elements, not a full cache copy —
        # the difference between ~13% and roofline HBM utilization at B=32).
        def layer_body(lp, h, ck_all, cv_all, l, static: bool):
            y = layer_norm(h, **lp["ln_1"], eps=cfg.layer_norm_epsilon)
            qkv = _linear(y, lp["attn"]["c_attn_w"], lp["attn"]["c_attn_b"])
            q, k, v = (split_heads(z, n_heads) for z in jnp.split(qkv, 3, axis=-1))
            ck_all = jax.lax.dynamic_update_slice(
                ck_all, k.astype(ck_all.dtype)[None],
                (l, 0, 0, start, 0))
            cv_all = jax.lax.dynamic_update_slice(
                cv_all, v.astype(cv_all.dtype)[None], (l, 0, 0, start, 0))
            if t > 1:
                # PREFILL: attend over this chunk's FRESH q/k/v instead of
                # reading back the just-written cache window. Multi-token
                # cached calls only ever happen with a fresh cache
                # (infer/decode._prefill, cache_len==0), where chunk-causal
                # attention is exactly the windowed computation. Besides
                # skipping the masked-tail FLOPs (t*t vs t*T_max logits),
                # this dodges a TPU backend fault bisected in round 4: the
                # bf16 write-then-read of a PADDED cache window inside the
                # layer scan returns garbage logits (argmax 0 for every row)
                # while the exact-size window, fp32 compute, and CPU are all
                # correct (tools/diag_e2e_tpu.py; runs/e2e empty-caption bug).
                out, _ = _attn_uncached(q, k, v, attn_bias)
            elif (t == 1 and DECODE_ATTN_KERNEL and attn_bias is None
                    and cache_ancestry is None):
                from construction_clip_tpu.ops import pallas_decode_attention

                out = pallas_decode_attention.decode_step_attention(
                    q, ck_all, cv_all, jnp.asarray(l, jnp.int32), start)
            else:
                if static:
                    # l is a Python int: static slices fuse into the attention
                    # reads — no [B,H,T,Dh] layer-slice copy materializes
                    ck, cv = ck_all[l], cv_all[l]
                else:
                    ck = jax.lax.dynamic_index_in_dim(ck_all, l, 0,
                                                      keepdims=False)
                    cv = jax.lax.dynamic_index_in_dim(cv_all, l, 0,
                                                      keepdims=False)
                out = _attn_over_cache(q, ck, cv, start, attn_bias,
                                       cache_ancestry)
            h = h + _linear(merge_heads(out), lp["attn"]["c_proj_w"],
                            lp["attn"]["c_proj_b"])
            y = layer_norm(h, **lp["ln_2"], eps=cfg.layer_norm_epsilon)
            y = gelu_new(_linear(y, lp["mlp"]["c_fc_w"], lp["mlp"]["c_fc_b"]))
            h = h + _linear(y, lp["mlp"]["c_proj_w"], lp["mlp"]["c_proj_b"])
            return h, ck_all, cv_all

        if t == 1 and UNROLL_DECODE:
            # decode step: UNROLL the layer loop so every cache access is a
            # static slice/update. The scan's dynamic_index_in_dim materialized
            # each layer's [B,H,T_max,Dh] k AND v windows every step (~28 MB of
            # extra HBM traffic per layer at B=32, T=141 — measured 0.76 ms of
            # the 1.0 ms device step, vs ~0.2 ms of unavoidable k+v reads;
            # tools/attr_decode.py)
            h, ck_all, cv_all = x, cache.k, cache.v
            for l in range(cfg.n_layer):
                lp = jax.tree.map(lambda z: z[l], p["blocks"])
                h, ck_all, cv_all = layer_body(lp, h, ck_all, cv_all, l,
                                               static=True)
            x, nk, nv = h, ck_all, cv_all
        else:
            def body(carry, lp):
                h, ck_all, cv_all, l = carry
                h, ck_all, cv_all = layer_body(lp, h, ck_all, cv_all, l,
                                               static=False)
                return (h, ck_all, cv_all, l + 1), None

            if remat:
                body = jax.checkpoint(body)
            (x, nk, nv, _), _ = jax.lax.scan(
                body, (x, cache.k, cache.v, jnp.zeros((), jnp.int32)),
                p["blocks"])
        x = layer_norm(x, **p["ln_f"], eps=cfg.layer_norm_epsilon)
        logits = _lm_logits(p, x)
        return logits, KVCache(k=nk, v=nv, length=cache.length + t)

    def body(carry, lp):
        return apply_block_uncached(lp, carry, attn_bias, cfg,
                                    return_probs=return_probs)

    if remat:
        body = jax.checkpoint(body)
    x, ys = jax.lax.scan(body, x, p["blocks"],
                         unroll=_train_unroll(p["blocks"], remat))

    x = layer_norm(x, **p["ln_f"], eps=cfg.layer_norm_epsilon)
    logits = _lm_logits(p, x)
    if return_probs:
        return logits, ys  # ys = probs [L, B, H, T, T]
    return logits, None


def embed_tokens(params, tokens, *, policy: Policy = DEFAULT_POLICY):
    """wte lookup — the ClipCap model concatenates these with projected prefixes."""
    return params["wte"][tokens].astype(policy.compute_dtype)


def from_hf_state_dict(sd, cfg: GPT2Config):
    import numpy as np

    def a(k):
        x = sd[k]
        if hasattr(x, "detach"):
            x = x.detach().cpu().numpy()
        return jnp.asarray(np.asarray(x))

    def pick(*names):
        for n in names:
            if n in sd:
                return n
        raise KeyError(names)

    prefix = "transformer." if any(k.startswith("transformer.") for k in sd) else ""

    def block(i):
        b = f"{prefix}h.{i}"
        return {
            "ln_1": {"scale": a(f"{b}.ln_1.weight"), "bias": a(f"{b}.ln_1.bias")},
            "attn": {
                "c_attn_w": a(f"{b}.attn.c_attn.weight"),  # Conv1D: already [in, out]
                "c_attn_b": a(f"{b}.attn.c_attn.bias"),
                "c_proj_w": a(f"{b}.attn.c_proj.weight"),
                "c_proj_b": a(f"{b}.attn.c_proj.bias"),
            },
            "ln_2": {"scale": a(f"{b}.ln_2.weight"), "bias": a(f"{b}.ln_2.bias")},
            "mlp": {
                "c_fc_w": a(f"{b}.mlp.c_fc.weight"),
                "c_fc_b": a(f"{b}.mlp.c_fc.bias"),
                "c_proj_w": a(f"{b}.mlp.c_proj.weight"),
                "c_proj_b": a(f"{b}.mlp.c_proj.bias"),
            },
        }

    blocks = [block(i) for i in range(cfg.n_layer)]
    return {
        "wte": a(pick(f"{prefix}wte.weight")),
        "wpe": a(pick(f"{prefix}wpe.weight")),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "ln_f": {"scale": a(f"{prefix}ln_f.weight"), "bias": a(f"{prefix}ln_f.bias")},
    }

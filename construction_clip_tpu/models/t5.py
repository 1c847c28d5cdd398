"""mT5 encoder-decoder (HF-compatible, defaults google/mt5-small), functional JAX.

The reference's T5 captioning variant wraps `MT5ForConditionalGeneration` (reference
CLIP_prefix_caption/train_t5.py:277-278) and injects the mapped CLIP prefix by
concatenating it onto `encoder_outputs.last_hidden_state` (train_t5.py:229-233).

Architecture facts this implementation pins (verified against HF T5/MT5):
  - RMSNorm (no bias, eps 1e-6), pre-norm residual blocks;
  - attention WITHOUT 1/sqrt(d_kv) scaling; q/k/v/o projections bias-free;
  - inner attention dim = num_heads * d_kv (384 for mt5-small, != d_model 512);
  - relative position bias: bucketed (32 buckets, max distance 128), computed by
    block 0 of each stack and SHARED by all later blocks; bidirectional buckets in
    the encoder, causal in the decoder; cross-attention has no position bias;
  - gated-GELU feedforward (wi_0 gelu gate * wi_1, then wo);
  - mt5-small does NOT tie embeddings: separate lm_head, no d_model**-0.5 scaling.

Decode support mirrors gpt2.py: static-shape self-attention KV cache per decoder
layer + cross-attention K/V computed once at prefill.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from construction_clip_tpu.core.configs import T5Config
from construction_clip_tpu.core.precision import Policy, DEFAULT_POLICY
from construction_clip_tpu.ops.activations import gelu_new
from construction_clip_tpu.ops.norms import rms_norm

NEG_INF = jnp.finfo(jnp.float32).min


# ---------------------------------------------------------------- rel-pos bias

def relative_position_bucket(rel_pos, *, bidirectional: bool, num_buckets: int,
                             max_distance: int):
    """HF T5 bucketing: rel_pos = key_pos - query_pos."""
    ret = jnp.zeros_like(rel_pos)
    n = rel_pos
    if bidirectional:
        num_buckets //= 2
        ret = ret + (n > 0).astype(jnp.int32) * num_buckets
        n = jnp.abs(n)
    else:
        n = jnp.maximum(-n, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-6)
        / np.log(max_distance / max_exact) * (num_buckets - max_exact)
    ).astype(jnp.int32)
    large = jnp.minimum(large, num_buckets - 1)
    return ret + jnp.where(is_small, n, large)


def compute_position_bias(rel_emb, q_pos, k_pos, cfg: T5Config, *, bidirectional: bool):
    """rel_emb: [num_buckets, H]; q_pos [Tq], k_pos [Tk] -> bias [1, H, Tq, Tk]."""
    rel = k_pos[None, :] - q_pos[:, None]
    buckets = relative_position_bucket(
        rel, bidirectional=bidirectional,
        num_buckets=cfg.relative_attention_num_buckets,
        max_distance=cfg.relative_attention_max_distance)
    bias = rel_emb[buckets]  # [Tq, Tk, H]
    return bias.transpose(2, 0, 1)[None]


# ---------------------------------------------------------------------- params

def _dense(key, i, o, std, dtype):
    return (jax.random.normal(key, (i, o)) * std).astype(dtype)


def init_t5(key, cfg: T5Config, dtype=jnp.float32):
    inner = cfg.num_heads * cfg.d_kv
    # 7 keys per encoder block, 11 per decoder block, 5 for embeddings/head
    n_keys = 5 + 7 * cfg.num_layers + 11 * cfg.num_decoder_layers
    ks = iter(jax.random.split(key, n_keys))

    def attn_params():
        return {
            "q": _dense(next(ks), cfg.d_model, inner, (cfg.d_model * cfg.d_kv) ** -0.5, dtype),
            "k": _dense(next(ks), cfg.d_model, inner, cfg.d_model ** -0.5, dtype),
            "v": _dense(next(ks), cfg.d_model, inner, cfg.d_model ** -0.5, dtype),
            "o": _dense(next(ks), inner, cfg.d_model, inner ** -0.5, dtype),
        }

    def ffn_params():
        return {
            "wi_0": _dense(next(ks), cfg.d_model, cfg.d_ff, cfg.d_model ** -0.5, dtype),
            "wi_1": _dense(next(ks), cfg.d_model, cfg.d_ff, cfg.d_model ** -0.5, dtype),
            "wo": _dense(next(ks), cfg.d_ff, cfg.d_model, cfg.d_ff ** -0.5, dtype),
        }

    def enc_block():
        return {
            "ln_attn": jnp.ones((cfg.d_model,), dtype),
            "attn": attn_params(),
            "ln_ffn": jnp.ones((cfg.d_model,), dtype),
            "ffn": ffn_params(),
        }

    def dec_block():
        return {
            "ln_self": jnp.ones((cfg.d_model,), dtype),
            "self_attn": attn_params(),
            "ln_cross": jnp.ones((cfg.d_model,), dtype),
            "cross_attn": attn_params(),
            "ln_ffn": jnp.ones((cfg.d_model,), dtype),
            "ffn": ffn_params(),
        }

    stack = lambda blocks: jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return {
        "shared": _dense(next(ks), cfg.vocab_size, cfg.d_model, 1.0, dtype),
        "enc_rel_emb": _dense(next(ks), cfg.relative_attention_num_buckets,
                              cfg.num_heads, 1.0, dtype),
        "dec_rel_emb": _dense(next(ks), cfg.relative_attention_num_buckets,
                              cfg.num_heads, 1.0, dtype),
        "encoder": stack([enc_block() for _ in range(cfg.num_layers)]),
        "enc_final_ln": jnp.ones((cfg.d_model,), dtype),
        "decoder": stack([dec_block() for _ in range(cfg.num_decoder_layers)]),
        "dec_final_ln": jnp.ones((cfg.d_model,), dtype),
        "lm_head": _dense(next(ks), cfg.d_model, cfg.vocab_size, cfg.d_model ** -0.5, dtype),
    }


# --------------------------------------------------------------------- attention

def _t5_attention(x, ap, cfg: T5Config, *, kv_x=None, bias=None):
    """T5 attention: unscaled dot product, bias-free projections.
    x [B,Tq,D]; kv_x for cross-attention; bias additive [*, H, Tq, Tk]."""
    h, dk = cfg.num_heads, cfg.d_kv
    src = x if kv_x is None else kv_x

    def heads(t):
        b, l, _ = t.shape
        return t.reshape(b, l, h, dk).transpose(0, 2, 1, 3)

    q, k, v = heads(x @ ap["q"]), heads(src @ ap["k"]), heads(src @ ap["v"])
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v, preferred_element_type=jnp.float32)
    out = out.astype(x.dtype).transpose(0, 2, 1, 3).reshape(x.shape[0], x.shape[1], h * dk)
    return out @ ap["o"]


def _ffn(x, fp):
    return (gelu_new(x @ fp["wi_0"]) * (x @ fp["wi_1"])) @ fp["wo"]


# ----------------------------------------------------------------------- encoder

def t5_encode(params, cfg: T5Config, input_ids=None, *, inputs_embeds=None,
              attention_mask=None, policy: Policy = DEFAULT_POLICY):
    """-> encoder hidden states [B, T, d_model]."""
    p = _cast_params(params, policy)
    x = p["shared"][input_ids] if inputs_embeds is None else \
        inputs_embeds.astype(policy.compute_dtype)
    t = x.shape[1]
    pos = jnp.arange(t)
    bias = compute_position_bias(p["enc_rel_emb"].astype(jnp.float32), pos, pos, cfg,
                                 bidirectional=True)
    if attention_mask is not None:
        bias = bias + jnp.where(attention_mask.astype(bool), 0.0, NEG_INF)[:, None, None, :]

    def body(h, bp):
        y = rms_norm(h, bp["ln_attn"], eps=cfg.layer_norm_epsilon)
        h = h + _t5_attention(y, bp["attn"], cfg, bias=bias)
        y = rms_norm(h, bp["ln_ffn"], eps=cfg.layer_norm_epsilon)
        h = h + _ffn(y, bp["ffn"])
        return h, None

    from construction_clip_tpu.models.gpt2 import _train_unroll
    x, _ = jax.lax.scan(body, x, p["encoder"], unroll=_train_unroll(p["encoder"]))
    return rms_norm(x, p["enc_final_ln"], eps=cfg.layer_norm_epsilon)


# ----------------------------------------------------------------------- decoder

class T5Cache(NamedTuple):
    k: jax.Array        # [L, B, H, T_max, d_kv] decoder self-attn keys
    v: jax.Array
    cross_k: jax.Array  # [L, B, H, T_enc, d_kv] computed once
    cross_v: jax.Array
    length: jax.Array


def t5_init_cache(params, cfg: T5Config, encoder_hidden, max_len: int,
                  *, policy: Policy = DEFAULT_POLICY) -> T5Cache:
    p = _cast_params(params, policy)
    b = encoder_hidden.shape[0]
    h, dk = cfg.num_heads, cfg.d_kv

    def heads(t):
        return t.reshape(b, -1, h, dk).transpose(0, 2, 1, 3)

    def per_layer(bp):
        return heads(encoder_hidden @ bp["cross_attn"]["k"]), \
               heads(encoder_hidden @ bp["cross_attn"]["v"])

    ck, cv = jax.vmap(per_layer, in_axes=(0,))(p["decoder"])
    shape = (cfg.num_decoder_layers, b, h, max_len, dk)
    return T5Cache(k=jnp.zeros(shape, policy.compute_dtype),
                   v=jnp.zeros(shape, policy.compute_dtype),
                   cross_k=ck, cross_v=cv, length=jnp.zeros((), jnp.int32))


def t5_decode(params, cfg: T5Config, decoder_input_ids, encoder_hidden, *,
              encoder_mask=None, cache: Optional[T5Cache] = None,
              policy: Policy = DEFAULT_POLICY):
    """Teacher-forced (cache=None) or incremental (cache) decoding.
    Returns (logits [B,T,V], new_cache|None)."""
    p = _cast_params(params, policy)
    x = p["shared"][decoder_input_ids]
    b, t = decoder_input_ids.shape
    h, dk = cfg.num_heads, cfg.d_kv
    start = cache.length if cache is not None else 0

    rel = p["dec_rel_emb"].astype(jnp.float32)
    if cache is None:
        pos = jnp.arange(t)
        self_bias = compute_position_bias(rel, pos, pos, cfg, bidirectional=False)
        causal = jnp.where(pos[:, None] >= pos[None, :], 0.0, NEG_INF)[None, None]
        self_bias = self_bias + causal
    else:
        t_max = cache.k.shape[3]
        q_pos = start + jnp.arange(t)
        k_pos = jnp.arange(t_max)
        self_bias = compute_position_bias(rel, q_pos, k_pos, cfg, bidirectional=False)
        self_bias = self_bias + jnp.where(q_pos[:, None] >= k_pos[None, :],
                                          0.0, NEG_INF)[None, None]
    cross_bias = None
    if encoder_mask is not None:
        cross_bias = jnp.where(encoder_mask.astype(bool), 0.0, NEG_INF)[:, None, None, :]

    def heads(z):
        return z.reshape(b, -1, h, dk).transpose(0, 2, 1, 3)

    def merge(z):
        return z.transpose(0, 2, 1, 3).reshape(b, -1, h * dk)

    def _mha(q, k, v, bias):
        """q [B,H,t,dh] over k/v [B,H,T,dh] with additive bias (T5: no 1/sqrt(dk)
        scale). t==1 (decode step) uses broadcast multiply-reduce — M=1 batched
        matmuls lower to B*H latency-bound MXU dispatches, while these fuse into
        two VPU kernels (same trick as models/gpt2._attn_over_cache)."""
        if q.shape[2] == 1:
            logits = jnp.sum(q[:, :, 0, :].astype(jnp.float32)[:, :, None, :]
                             * k.astype(jnp.float32), axis=-1)       # [B,H,T]
            if bias is not None:
                b32 = bias.astype(jnp.float32)
                if b32.ndim >= 2:
                    b32 = b32[..., 0, :]  # drop the t==1 query axis
                logits = logits + b32
            probs = jax.nn.softmax(logits, axis=-1)
            out = jnp.sum(probs[..., None] * v.astype(jnp.float32), axis=2)
            return out[:, :, None, :].astype(q.dtype)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        if bias is not None:
            logits = logits + bias
        probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                          preferred_element_type=jnp.float32).astype(q.dtype)

    def self_attn(hid, bp, k, v):
        q = heads(rms_norm(hid, bp["ln_self"], eps=cfg.layer_norm_epsilon)
                  @ bp["self_attn"]["q"])
        att = _mha(q, k, v, self_bias)
        return hid + merge(att) @ bp["self_attn"]["o"]

    def cross_and_ffn(hid, bp, kx, vx):
        y = rms_norm(hid, bp["ln_cross"], eps=cfg.layer_norm_epsilon)
        qx = heads(y @ bp["cross_attn"]["q"])
        att = _mha(qx, kx, vx, cross_bias)
        hid = hid + merge(att) @ bp["cross_attn"]["o"]
        y = rms_norm(hid, bp["ln_ffn"], eps=cfg.layer_norm_epsilon)
        return hid + _ffn(y, bp["ffn"])

    if cache is not None:
        # Self-attn KV cache rides the scan CARRY (in-place row writes via
        # dynamic_update_slice on the aliased carry buffers — see gpt2.py);
        # the read-only cross K/V are scanned per layer as xs.
        def body(carry, layer):
            hid, k_all, v_all, l = carry
            bp, xk, xv = layer
            y = rms_norm(hid, bp["ln_self"], eps=cfg.layer_norm_epsilon)
            k = heads(y @ bp["self_attn"]["k"])
            v = heads(y @ bp["self_attn"]["v"])
            k_all = jax.lax.dynamic_update_slice(
                k_all, k.astype(k_all.dtype)[None], (l, 0, 0, start, 0))
            v_all = jax.lax.dynamic_update_slice(
                v_all, v.astype(v_all.dtype)[None], (l, 0, 0, start, 0))
            ck = jax.lax.dynamic_index_in_dim(k_all, l, 0, keepdims=False)
            cv = jax.lax.dynamic_index_in_dim(v_all, l, 0, keepdims=False)
            q_dtype = y.dtype
            hid = self_attn(hid, bp, ck.astype(q_dtype), cv.astype(q_dtype))
            hid = cross_and_ffn(hid, bp, xk.astype(q_dtype), xv.astype(q_dtype))
            return (hid, k_all, v_all, l + 1), None

        (x, nk, nv, _), _ = jax.lax.scan(
            body, (x, cache.k, cache.v, jnp.zeros((), jnp.int32)),
            (p["decoder"], cache.cross_k, cache.cross_v))
        new_cache = T5Cache(k=nk, v=nv, cross_k=cache.cross_k,
                            cross_v=cache.cross_v, length=cache.length + t)
    else:
        def body(hid, bp):
            y = rms_norm(hid, bp["ln_self"], eps=cfg.layer_norm_epsilon)
            k = heads(y @ bp["self_attn"]["k"])
            v = heads(y @ bp["self_attn"]["v"])
            hid = self_attn(hid, bp, k, v)
            kx = heads(encoder_hidden.astype(y.dtype) @ bp["cross_attn"]["k"])
            vx = heads(encoder_hidden.astype(y.dtype) @ bp["cross_attn"]["v"])
            hid = cross_and_ffn(hid, bp, kx, vx)
            return hid, None

        from construction_clip_tpu.models.gpt2 import _train_unroll
        x, _ = jax.lax.scan(body, x, p["decoder"],
                            unroll=_train_unroll(p["decoder"]))
        new_cache = None

    x = rms_norm(x, p["dec_final_ln"], eps=cfg.layer_norm_epsilon)
    if cfg.tie_word_embeddings:
        x = x * (cfg.d_model ** -0.5)
        logits = (x @ p["shared"].T).astype(jnp.float32)
    else:
        logits = _head_logits(p["lm_head"], x, cfg.vocab_size,
                              cached_step=cache is not None and t == 1)
    return logits, new_cache


def _head_logits(head, x, vocab: int, *, cached_step: bool):
    """LM-head projection with the decode-step fast path.

    head: [D, V>=vocab] table (possibly pre-padded by prepare_decode_head),
    or {"q": int8, "s": f32} from quantize_t5_head. On TPU cached
    single-token steps at small B the streaming Pallas GEMV reads the table
    at its HBM roofline (ops/pallas_vocab_head.py; the 250112-vocab read is
    62% of the B=1 step — BASELINE.md "mT5 B=1 decode floor"); everywhere
    else XLA's GEMM wins. Output is always sliced to [.., vocab] so padded
    columns (logit 0) can never win the argmax.
    """
    import jax as _jax

    quant = isinstance(head, dict)
    table = head["q"] if quant else head
    scale = head["s"] if quant else None
    b = x.shape[0]
    if cached_step and _jax.default_backend() == "tpu":
        from construction_clip_tpu.ops import pallas_vocab_head as pvh

        if pvh.supported(b, table):
            return pvh.vocab_head_logits(x[:, 0], table,
                                         scale)[:, None, :vocab]
    if quant:
        # dequant folded into the dot epilogue: the read stays int8 bytes
        # (A/B: beats the bf16 table at B=32 too — tools/ab_t5_head.py)
        return (((x @ table.astype(x.dtype)).astype(jnp.float32)
                 * scale.astype(jnp.float32))[..., :vocab])
    return (x @ table).astype(jnp.float32)[..., :vocab]


def prepare_decode_head(params, cfg: T5Config):
    """One-time decode-loop prep (call OUTSIDE the step loop, after the
    policy cast — infer/decode_t5.t5_generate does): on TPU, zero-pad the
    untied LM head to the streaming kernel's preferred 2048-lane tile.
    mT5's 250112 vocab only tiles at 256 lanes raw (977 grid programs,
    0.888 ms/apply); padded to 123x2048 it runs 0.700 vs 0.960 for XLA
    (tools/ab_t5_head.py, B=1). _head_logits slices logits back to
    cfg.vocab_size, so the padding is invisible to sampling."""
    import jax as _jax

    if _jax.default_backend() != "tpu" or cfg.tie_word_embeddings \
            or "lm_head" not in params:
        return params
    from construction_clip_tpu.ops.pallas_vocab_head import TILE, pad_to_tile

    head = params["lm_head"]
    if isinstance(head, dict):
        q, s = pad_to_tile(head["q"], head["s"], TILE)
        return dict(params, lm_head={"q": q, "s": s})
    table, _ = pad_to_tile(head, None, TILE)
    return dict(params, lm_head=table)


def quantize_t5_head(params):
    """Weight-only int8 LM head (serving config, the models/gpt2.quantize_gpt2
    pattern): halves the 256 MB-per-step table read that dominates B=1 decode.
    Only meaningful for untied heads (mt5-small is untied — models/t5.py:15)."""
    from construction_clip_tpu.ops.quant import quantize_weight

    if "lm_head" not in params:
        raise ValueError("quantize_t5_head: params have no untied lm_head")
    q, s = quantize_weight(params["lm_head"], axis=0)
    return dict(params, lm_head={"q": q, "s": s})


def _cast_params(params, policy: Policy):
    """policy.cast_to_compute that leaves a quantized lm_head intact (int8
    table uncast by design; the f32 scale must NOT be rounded to bf16)."""
    if isinstance(params.get("lm_head"), dict):
        head = params["lm_head"]
        rest = {k: v for k, v in params.items() if k != "lm_head"}
        return dict(policy.cast_to_compute(rest), lm_head=head)
    return policy.cast_to_compute(params)


def t5_forward(params, cfg: T5Config, *, input_ids=None, inputs_embeds=None,
               attention_mask=None, decoder_input_ids=None, encoder_hidden=None,
               policy: Policy = DEFAULT_POLICY):
    """Full seq2seq forward. Pass encoder_hidden to inject modified encoder states
    (the ClipCap prefix-concat trick, reference train_t5.py:233,265-270)."""
    if encoder_hidden is None:
        encoder_hidden = t5_encode(params, cfg, input_ids, inputs_embeds=inputs_embeds,
                                   attention_mask=attention_mask, policy=policy)
    logits, _ = t5_decode(params, cfg, decoder_input_ids, encoder_hidden,
                          encoder_mask=attention_mask, policy=policy)
    return logits, encoder_hidden


# -------------------------------------------------------------------- converter

def from_hf_state_dict(sd, cfg: T5Config):
    def a(k):
        x = sd[k]
        if hasattr(x, "detach"):
            x = x.detach().cpu().numpy()
        return jnp.asarray(np.asarray(x))

    def lin(k):
        return jnp.asarray(a(k).T)  # torch Linear [out,in] -> [in,out]

    def enc_block(i):
        b = f"encoder.block.{i}"
        return {
            "ln_attn": a(f"{b}.layer.0.layer_norm.weight"),
            "attn": {
                "q": lin(f"{b}.layer.0.SelfAttention.q.weight"),
                "k": lin(f"{b}.layer.0.SelfAttention.k.weight"),
                "v": lin(f"{b}.layer.0.SelfAttention.v.weight"),
                "o": lin(f"{b}.layer.0.SelfAttention.o.weight"),
            },
            "ln_ffn": a(f"{b}.layer.1.layer_norm.weight"),
            "ffn": {
                "wi_0": lin(f"{b}.layer.1.DenseReluDense.wi_0.weight"),
                "wi_1": lin(f"{b}.layer.1.DenseReluDense.wi_1.weight"),
                "wo": lin(f"{b}.layer.1.DenseReluDense.wo.weight"),
            },
        }

    def dec_block(i):
        b = f"decoder.block.{i}"
        return {
            "ln_self": a(f"{b}.layer.0.layer_norm.weight"),
            "self_attn": {
                "q": lin(f"{b}.layer.0.SelfAttention.q.weight"),
                "k": lin(f"{b}.layer.0.SelfAttention.k.weight"),
                "v": lin(f"{b}.layer.0.SelfAttention.v.weight"),
                "o": lin(f"{b}.layer.0.SelfAttention.o.weight"),
            },
            "ln_cross": a(f"{b}.layer.1.layer_norm.weight"),
            "cross_attn": {
                "q": lin(f"{b}.layer.1.EncDecAttention.q.weight"),
                "k": lin(f"{b}.layer.1.EncDecAttention.k.weight"),
                "v": lin(f"{b}.layer.1.EncDecAttention.v.weight"),
                "o": lin(f"{b}.layer.1.EncDecAttention.o.weight"),
            },
            "ln_ffn": a(f"{b}.layer.2.layer_norm.weight"),
            "ffn": {
                "wi_0": lin(f"{b}.layer.2.DenseReluDense.wi_0.weight"),
                "wi_1": lin(f"{b}.layer.2.DenseReluDense.wi_1.weight"),
                "wo": lin(f"{b}.layer.2.DenseReluDense.wo.weight"),
            },
        }

    stack = lambda blocks: jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    params = {
        "shared": a("shared.weight"),
        "enc_rel_emb": a("encoder.block.0.layer.0.SelfAttention"
                         ".relative_attention_bias.weight"),
        "dec_rel_emb": a("decoder.block.0.layer.0.SelfAttention"
                         ".relative_attention_bias.weight"),
        "encoder": stack([enc_block(i) for i in range(cfg.num_layers)]),
        "enc_final_ln": a("encoder.final_layer_norm.weight"),
        "decoder": stack([dec_block(i) for i in range(cfg.num_decoder_layers)]),
        "dec_final_ln": a("decoder.final_layer_norm.weight"),
    }
    params["lm_head"] = jnp.asarray(a("lm_head.weight").T) if "lm_head.weight" in sd \
        else jnp.asarray(a("shared.weight"))
    return params

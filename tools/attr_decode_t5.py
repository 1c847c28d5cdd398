"""mT5 cached-decode per-step attribution on the real chip (VERDICT r3 item 4:
B=1 runs 0.95 ms/step, 2.6x the ~0.36 ms tunnel/loop floor that GPT-2 B=1
sits at, with no attribution).

Hypotheses this separates, each a local variant of the t5_generate loop
(models/t5.py t5_decode cached path):

  full        greedy t5_generate (== tools/bench_decode_t5.py workload)
  no_cast     params pre-cast to bf16 OUTSIDE the jit — if XLA fails to hoist
              policy.cast_to_compute(params) out of the while body, the
              250112x512 shared table (512 MB fp32 read + 256 MB write) is
              re-cast EVERY step (~0.9 ms of HBM traffic on its own)
  no_lmhead   final projection replaced by a 128-wide head — the tied LM head
              reads the whole 250112x512 bf16 table (256 MB = ~0.31 ms at the
              819 GB/s roofline) per step; mT5's vocab is 12x GPT-2's
  no_bias     relative-position bias replaced by zeros (the per-step bucket
              math + gather chain)
  no_cross    cross-attention skipped (the second cache family)
  loop_floor  body = token bookkeeping only (while_loop floor at this carry)

B=1 and B=32 (the regression guard). Prints one JSON line. Run on axon from
/root/repo via nohup."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_util import log, put_ms, setup_jax_cache, timed_windows

setup_jax_cache()

import functools

import jax
import jax.numpy as jnp
import numpy as np

from construction_clip_tpu.core.configs import T5Config
from construction_clip_tpu.core.precision import BF16_POLICY
from construction_clip_tpu.models.t5 import (T5Cache, init_t5, t5_decode,
                                             t5_init_cache,
                                             compute_position_bias, NEG_INF)
from construction_clip_tpu.ops.activations import gelu_new
from construction_clip_tpu.ops.norms import rms_norm

STEPS = 32
tcfg = T5Config()  # mT5-small
params = init_t5(jax.random.key(0), tcfg)
policy = BF16_POLICY
ENC_T = 30  # prefix 20 + attribute-ish (bench_decode_t5 uses ~this)
results = {"steps": STEPS, "enc_t": ENC_T}


def make_generate(variant: str):
    precast = variant == "no_cast"

    def gen(p_in, enc):
        b = enc.shape[0]
        p = p_in if precast else None

        def decode(p_raw, ids, cache):
            """local copy of the cached t5_decode call with variant knobs"""
            if variant == "no_lmhead":
                logits, cache = _decode_body(p_raw, ids, enc, cache,
                                             small_head=True)
            elif variant == "no_bias":
                logits, cache = _decode_body(p_raw, ids, enc, cache,
                                             zero_bias=True)
            elif variant == "no_cross":
                logits, cache = _decode_body(p_raw, ids, enc, cache,
                                             skip_cross=True)
            else:
                logits, cache = t5_decode(p_raw, tcfg, ids, enc, cache=cache,
                                          policy=policy)
            return logits, cache

        cache = t5_init_cache(p_in, tcfg, enc, max_len=STEPS + 1, policy=policy)
        logits, cache = decode(p_in, jnp.zeros((b, 1), jnp.int32), cache)

        def cond(s):
            step, _, _, _ = s
            return step < STEPS

        def body(s):
            step, toks, cache, last = s
            nxt = jnp.argmax(last.astype(jnp.float32), axis=-1).astype(jnp.int32)
            toks = toks.at[:, step].set(nxt)
            if variant == "loop_floor":
                return step + 1, toks, cache, last
            logits, cache = decode(p_in, nxt[:, None], cache)
            return step + 1, toks, cache, logits[:, 0]

        _, toks, _, _ = jax.lax.while_loop(
            cond, body, (jnp.zeros((), jnp.int32),
                         jnp.zeros((b, STEPS), jnp.int32), cache, logits[:, 0]))
        return toks

    return gen


def _decode_body(params, decoder_input_ids, encoder_hidden, cache, *,
                 small_head=False, zero_bias=False, skip_cross=False):
    """t5_decode's cached path (models/t5.py:214-) with ablation knobs."""
    p = policy.cast_to_compute(params)
    x = p["shared"][decoder_input_ids]
    b, t = decoder_input_ids.shape
    h, dk = tcfg.num_heads, tcfg.d_kv
    start = cache.length

    t_max = cache.k.shape[3]
    if zero_bias:
        qp = start + jnp.arange(t)
        mask2d = jnp.where(qp[:, None] >= jnp.arange(t_max)[None, :], 0.0,
                           NEG_INF)                       # [t, t_max]
        self_bias = jnp.broadcast_to(mask2d[None, None], (1, h, t, t_max))
    else:
        rel = p["dec_rel_emb"].astype(jnp.float32)
        q_pos = start + jnp.arange(t)
        k_pos = jnp.arange(t_max)
        self_bias = compute_position_bias(rel, q_pos, k_pos, tcfg,
                                          bidirectional=False)
        self_bias = self_bias + jnp.where(q_pos[:, None] >= k_pos[None, :],
                                          0.0, NEG_INF)[None, None]

    def heads(z):
        return z.reshape(b, -1, h, dk).transpose(0, 2, 1, 3)

    def merge(z):
        return z.transpose(0, 2, 1, 3).reshape(b, -1, h * dk)

    def _mha(q, k, v, bias):
        logits = jnp.sum(q[:, :, 0, :].astype(jnp.float32)[:, :, None, :]
                         * k.astype(jnp.float32), axis=-1)
        if bias is not None:
            b32 = bias.astype(jnp.float32)
            if b32.ndim >= 2:
                b32 = b32[..., 0, :]
            logits = logits + b32
        probs = jax.nn.softmax(logits, axis=-1)
        out = jnp.sum(probs[..., None] * v.astype(jnp.float32), axis=2)
        return out[:, :, None, :].astype(q.dtype)

    def _ffn(y, fp):
        return (gelu_new(y @ fp["wi_0"]) * (y @ fp["wi_1"])) @ fp["wo"]

    def body(carry, layer):
        hid, k_all, v_all, l = carry
        bp, xk, xv = layer
        y = rms_norm(hid, bp["ln_self"], eps=tcfg.layer_norm_epsilon)
        k = heads(y @ bp["self_attn"]["k"])
        v = heads(y @ bp["self_attn"]["v"])
        k_all = jax.lax.dynamic_update_slice(
            k_all, k.astype(k_all.dtype)[None], (l, 0, 0, start, 0))
        v_all = jax.lax.dynamic_update_slice(
            v_all, v.astype(v_all.dtype)[None], (l, 0, 0, start, 0))
        ck = jax.lax.dynamic_index_in_dim(k_all, l, 0, keepdims=False)
        cv = jax.lax.dynamic_index_in_dim(v_all, l, 0, keepdims=False)
        q = heads(y @ bp["self_attn"]["q"])
        att = _mha(q, ck.astype(y.dtype), cv.astype(y.dtype), self_bias)
        hid = hid + merge(att) @ bp["self_attn"]["o"]
        if not skip_cross:
            y2 = rms_norm(hid, bp["ln_cross"], eps=tcfg.layer_norm_epsilon)
            qx = heads(y2 @ bp["cross_attn"]["q"])
            attx = _mha(qx, xk.astype(y2.dtype), xv.astype(y2.dtype), None)
            hid = hid + merge(attx) @ bp["cross_attn"]["o"]
        y3 = rms_norm(hid, bp["ln_ffn"], eps=tcfg.layer_norm_epsilon)
        hid = hid + _ffn(y3, bp["ffn"])
        return (hid, k_all, v_all, l + 1), None

    (x, nk, nv, _), _ = jax.lax.scan(
        body, (x, cache.k, cache.v, jnp.zeros((), jnp.int32)),
        (p["decoder"], cache.cross_k, cache.cross_v))
    new_cache = T5Cache(k=nk, v=nv, cross_k=cache.cross_k,
                        cross_v=cache.cross_v, length=cache.length + t)

    x = rms_norm(x, p["dec_final_ln"], eps=tcfg.layer_norm_epsilon)
    if small_head:
        logits = (x @ p["shared"][:128].T).astype(jnp.float32)
        logits = jnp.pad(logits, ((0, 0), (0, 0), (0, tcfg.vocab_size - 128)))
    else:
        x = x * (tcfg.d_model ** -0.5) if tcfg.tie_word_embeddings else x
        logits = (x @ (p["shared"].T if tcfg.tie_word_embeddings
                       else p["lm_head"])).astype(jnp.float32)
    return logits, new_cache


VARIANTS = ("full", "no_cast", "no_lmhead", "no_bias", "no_cross", "loop_floor")

for B in (1, 32):
    enc = jnp.asarray(np.random.default_rng(0).standard_normal(
        (B, ENC_T, tcfg.d_model)), jnp.float32)
    for variant in VARIANTS:
        gen = jax.jit(make_generate(variant))
        p_in = policy.cast_to_compute(params) if variant == "no_cast" else params
        try:
            gen(p_in, enc)  # compile
            st = timed_windows(lambda: gen(p_in, enc), windows=5, iters=3,
                               warmup=3, sync=np.asarray)
            ms_step = st[0] * 1e3 / STEPS
            results[f"b{B}_{variant}_ms_step"] = round(ms_step, 3)
            results[f"b{B}_{variant}_tok_s"] = round(B * STEPS / st[0], 1)
            log(f"B={B} {variant}: {ms_step:.3f} ms/step "
                f"({B * STEPS / st[0]:.0f} tok/s)")
        except Exception as e:
            log(f"B={B} {variant}: {type(e).__name__}: {str(e)[:200]}")
            results[f"b{B}_{variant}_error"] = type(e).__name__

print(json.dumps(results))

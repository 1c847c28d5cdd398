"""Contrastive-step ablation attribution, device-true (VERDICT r2 item 5).

Each variant is 10 full train steps (fwd+bwd+fused AdamW) inside ONE jit via
lax.scan over the TrainState — one host sync per 10 steps, so the ~30 ms
per-call tunnel round-trip contributes ≤3 ms/step and cancels in deltas.

Variants (towers replicate models/clip.encode_* with the same fused-block
fast path; ablations swap block sub-parts for identity):
  full       == the real step (sanity: must match bench_train/step_scanned)
  no_attn    attention sub-block = identity in BOTH towers
  no_mlp     MLP sub-block = identity in BOTH towers
  img_only   loss = sum(img_feats^2) — text tower dropped entirely
  txt_only   loss = sum(txt_feats^2)
  fwd_only   10 scanned loss forwards, no grad/optimizer
  adamw_only 10 scanned optimizer updates on fixed grads
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/cctpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from construction_clip_tpu.core.configs import CLIPConfig
from construction_clip_tpu.core.precision import BF16_POLICY
from construction_clip_tpu.models.clip import init_clip
from construction_clip_tpu.models.clip.model import patchify
from construction_clip_tpu.ops import pallas_attention_block as fab
from construction_clip_tpu.ops.activations import quick_gelu
from construction_clip_tpu.ops.norms import layer_norm
from construction_clip_tpu.parallel.infonce import local_infonce
from construction_clip_tpu.train.state import TrainState, apply_gradients, make_adamw

B, SCAN = 128, 10
cfg = CLIPConfig.vit_b_32()
policy = BF16_POLICY
tx = make_adamw(1e-5, warmup_steps=0, total_steps=1000)
toks = jnp.zeros((B, 77), jnp.int32).at[:, 0].set(49406).at[:, 1].set(49407)
images = jax.random.normal(jax.random.key(1), (B, 224, 224, 3), jnp.float32)
results = {}


def block_ablate(pms, x, n_heads, use_attn, use_mlp, causal):
    if use_attn:
        # same fast path as models/blocks.apply_block
        x = fab.fused_attention_block(x, pms["ln_1"], pms["attn"],
                                      n_heads=n_heads, causal=causal)
    if use_mlp:
        h = layer_norm(x, **pms["ln_2"], eps=1e-5)
        h = quick_gelu(h @ pms["mlp"]["w_fc"] + pms["mlp"]["b_fc"])
        x = x + (h @ pms["mlp"]["w_proj"] + pms["mlp"]["b_proj"])
    return x


def towers(params, use_attn, use_mlp, use_img, use_txt, jitter=0.0):
    feats = []
    if use_img:
        v = cfg.vision
        p = policy.cast_to_compute(params["vision"])
        # jitter is a traced per-iteration scalar: keeps the forward
        # loop-variant so XLA cannot hoist it out of the measurement scan
        x = patchify((images + jitter).astype(policy.compute_dtype),
                     v.patch_size)
        x = x @ p["patch_embed"]
        cls = jnp.broadcast_to(p["class_emb"], (x.shape[0], 1, v.width))
        x = jnp.concatenate([cls, x], axis=1) + p["pos_emb"]
        x = layer_norm(x, **p["ln_pre"])
        for l in range(v.layers):
            x = block_ablate(jax.tree.map(lambda z: z[l], p["blocks"]), x,
                             v.heads, use_attn, use_mlp, False)
        x = layer_norm(x[:, 0, :], **p["ln_post"])
        f = policy.cast_to_output(x @ p["proj"])
        feats.append(f / jnp.linalg.norm(f, axis=-1, keepdims=True))
    if use_txt:
        t = cfg.text
        p = policy.cast_to_compute(params["text"])
        x = p["tok_emb"][toks] + p["pos_emb"][:77]
        for l in range(t.layers):
            x = block_ablate(jax.tree.map(lambda z: z[l], p["blocks"]), x,
                             t.heads, use_attn, use_mlp, True)
        x = layer_norm(x, **p["ln_final"])
        eot = jnp.argmax(toks, axis=-1)
        x = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0, :]
        f = policy.cast_to_output(x @ p["proj"])
        feats.append(f / jnp.linalg.norm(f, axis=-1, keepdims=True))
    return feats


def make_loss(use_attn=True, use_mlp=True, use_img=True, use_txt=True):
    def loss_fn(params, jitter=0.0):
        feats = towers(params, use_attn, use_mlp, use_img, use_txt, jitter)
        if len(feats) == 2:
            return local_infonce(feats[0], feats[1], params["logit_scale"])[0]
        return jnp.sum(jnp.square(feats[0].astype(jnp.float32)))

    return loss_fn


def timeit(name, fn, state):
    out = fn(state)
    s = out[0] if isinstance(out, tuple) else out
    _ = np.asarray(jax.tree.leaves(s)[0])
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = fn(out if not isinstance(out, tuple) else out[0])
        s = out[0] if isinstance(out, tuple) else out
        _ = np.asarray(jax.tree.leaves(s)[0])
        times.append((time.perf_counter() - t0) / SCAN)
    times.sort()
    results[name] = round(times[2] * 1e3, 2)
    print(f"{name}: {times[2]*1e3:.2f} ms/step "
          f"[{times[0]*1e3:.2f},{times[-1]*1e3:.2f}]", flush=True)


for name, kw in (("full", {}),
                 ("no_attn", {"use_attn": False}),
                 ("no_mlp", {"use_mlp": False}),
                 ("img_only", {"use_txt": False}),
                 ("txt_only", {"use_img": False})):
    loss_fn = make_loss(**kw)
    params = init_clip(jax.random.key(0), cfg)
    state = TrainState.create(params, tx)

    @jax.jit
    def scanned(s):
        def body(s, _):
            loss, grads = jax.value_and_grad(loss_fn)(s.params)
            return apply_gradients(s, grads, tx), loss

        s, losses = jax.lax.scan(body, s, None, length=SCAN)
        return s, losses[-1]

    try:
        timeit(name, scanned, state)
    except Exception as e:
        print(f"{name}: {type(e).__name__}: {str(e)[:200]}", flush=True)
    del state, params, scanned

# forward-only and optimizer-only
params = init_clip(jax.random.key(0), cfg)
loss_fn = make_loss()


@jax.jit
def fwd10(p):
    def body(c, _):
        return c + loss_fn(p, jitter=c * 1e-20), None

    c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=SCAN)
    return c


out = fwd10(params)
_ = np.asarray(out)
times = []
for _ in range(5):
    t0 = time.perf_counter()
    _ = np.asarray(fwd10(params))
    times.append((time.perf_counter() - t0) / SCAN)
times.sort()
results["fwd_only"] = round(times[2] * 1e3, 2)
print(f"fwd_only: {times[2]*1e3:.2f} ms/step", flush=True)

grads = jax.tree.map(lambda x: (x * 1e-3).astype(x.dtype)
                     if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
state = TrainState.create(params, tx)


@jax.jit
def opt10(s, g):
    # grads ride as an ARGUMENT: closed-over they would inline ~600 MB of
    # constants into the program upload (axon remote_compile chokes for
    # minutes / HTTP 413 — verify SKILL.md)
    def body(s, _):
        return apply_gradients(s, g, tx), None

    s, _ = jax.lax.scan(body, s, None, length=SCAN)
    return s


timeit("adamw_only", lambda s: opt10(s, grads), state)
print(json.dumps(results), flush=True)

"""Drive A: jax flash-attention delegation at ViT-L shapes (T=257 -> pad 384).

Checks fwd numerics vs the XLA einsum path and that grads flow (bwd kernel
compiles) at [B=8, H=16, T=257, dh=64] bf16.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from construction_clip_tpu.ops.attention import mha

t0 = time.time()
B, H, T, DH = 8, 16, 257, 64
key = jax.random.key(0)
kq, kk, kv = jax.random.split(key, 3)
q = jax.random.normal(kq, (B, H, T, DH), jnp.bfloat16)
k = jax.random.normal(kk, (B, H, T, DH), jnp.bfloat16)
v = jax.random.normal(kv, (B, H, T, DH), jnp.bfloat16)

f_flash = jax.jit(lambda q, k, v: mha(q, k, v, impl="pallas"))
f_xla = jax.jit(lambda q, k, v: mha(q, k, v, impl="xla"))
o1 = np.asarray(f_flash(q, k, v), np.float32)
o2 = np.asarray(f_xla(q, k, v), np.float32)
err = np.max(np.abs(o1 - o2))
print(f"fwd max|diff| = {err:.5f} ({time.time()-t0:.0f}s)", flush=True)
assert err < 0.02, err

def loss_flash(q, k, v):
    return jnp.sum(mha(q, k, v, impl="pallas").astype(jnp.float32) ** 2)

def loss_xla(q, k, v):
    return jnp.sum(mha(q, k, v, impl="xla").astype(jnp.float32) ** 2)

g1 = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))(q, k, v)
g2 = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2)))(q, k, v)
for name, a, b in zip("qkv", g1, g2):
    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    rel = np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-6)
    print(f"d{name} rel err {rel:.4f}", flush=True)
    assert rel < 0.05, (name, rel)
print(f"FLASH OK ({time.time()-t0:.0f}s)", flush=True)

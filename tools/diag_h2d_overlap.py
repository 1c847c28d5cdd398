"""Does the axon tunnel overlap H2D transfers with device compute?

Decides whether serve/app._drain_loop should issue both batches' device_puts
before launching either program (the detector H2D is ~12.6 MB per 16-drain —
~0.4 s at the tunnel's ~30 MB/s — while caption+detect compute is ~150 ms;
full overlap would hide the compute entirely, no overlap means the current
serial order is already optimal).

Measures, with one host sync at the end of each timed window:
  put_only     device_put of an 8 MB uint8 buffer (fresh data each iter)
  compute_only a ~200 ms chained-matmul jit
  both_serial  put -> wait -> compute (upper bound)
  both_issued  put issued first, compute launched immediately (overlap if
               the tunnel pipelines them)

Prints one JSON line. Run on axon from /root/repo via nohup.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_util import log, setup_jax_cache

setup_jax_cache()

import jax
import jax.numpy as jnp
import numpy as np

N_MB = 8
REPS = 3
bufs = [np.random.default_rng(i).integers(
    0, 255, (N_MB * 1024 * 1024,), np.uint8) for i in range(REPS * 4)]

A = jnp.asarray(np.random.default_rng(9).standard_normal((4096, 4096)),
                jnp.bfloat16)


@jax.jit
def burn(a):
    def body(i, x):
        return (x @ a).astype(jnp.bfloat16)
    return jax.lax.fori_loop(0, 200, body, a)


np.asarray(burn(A))  # compile + warm
log("warmed")

buf_i = 0


def next_buf():
    global buf_i
    b = bufs[buf_i % len(bufs)]
    buf_i += 1
    return b


results = {"n_mb": N_MB}
for name in ("put_only", "compute_only", "both_serial", "both_issued"):
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        if name == "put_only":
            d = jax.device_put(next_buf())
            d.block_until_ready()
            float(d[0])
        elif name == "compute_only":
            out = burn(A)
            np.asarray(out[0, 0])
        elif name == "both_serial":
            d = jax.device_put(next_buf())
            d.block_until_ready()
            float(d[0])
            out = burn(A)
            np.asarray(out[0, 0])
        else:  # both_issued
            d = jax.device_put(next_buf())     # async
            out = burn(A)                      # launch immediately
            np.asarray(out[0, 0])
            float(d[0])
        ts.append(time.perf_counter() - t0)
    results[name + "_ms"] = round(sorted(ts)[len(ts) // 2] * 1e3, 1)
    log(name, results[name + "_ms"], "ms", [round(t * 1e3) for t in ts])

print(json.dumps(results))

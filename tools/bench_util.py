"""Shared timing harness for bench.py and tools/bench_*.py: every metric is the
MEDIAN over >=5 timed windows, reported with its [min, max] spread. Round-2
review found point-estimate benches hiding an ~8% run-to-run spread across
README/BASELINE/BENCH_SNAPSHOT; dispersion is now part of the schema and the
docs tables are regenerated from BENCH_SNAPSHOT.json (tools/update_docs.py).

Axon-tunnel measurement rules baked in (.claude/skills/verify/SKILL.md):
sync via a host transfer per window (block_until_ready can return early
through the tunnel; in-order execution means syncing the last output bounds
the window), warm the post-compile pipeline OUT of the timed windows, and use
the persistent compile cache.
"""

from __future__ import annotations

import os
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def setup_jax_cache():
    import jax

    cache_dir = os.environ.get("CCTPU_COMPILE_CACHE",
                               os.path.expanduser("~/.cache/cctpu_xla"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _default_sync(out):
    import jax
    import numpy as np

    leaves = [l for l in jax.tree.leaves(out) if hasattr(l, "dtype")]
    if leaves:
        np.asarray(leaves[0])


def timed_windows(fn, *, windows: int = 5, iters: int = 20, warmup: int = 5,
                  sync=_default_sync):
    """Time fn over `windows` independent windows of `iters` calls each.

    Returns (median, min, max) seconds PER ITERATION across windows. The first
    call compiles; `warmup` further calls flush the slow post-compile pipeline
    before any window is timed.
    """
    out = fn()
    sync(out)  # compile + first execution
    for _ in range(warmup):
        out = fn()
    sync(out)
    times = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        sync(out)
        times.append((time.perf_counter() - t0) / iters)
    times.sort()
    return times[len(times) // 2], times[0], times[-1]


def put_rate(results: dict, key: str, stats, scale: float, ndigits: int = 1):
    """Record scale/seconds as results[key]=median and results[key+'_minmax']."""
    med, lo, hi = stats
    results[key] = round(scale / med, ndigits)
    results[key + "_minmax"] = [round(scale / hi, ndigits),
                                round(scale / lo, ndigits)]
    return results[key]


def put_ms(results: dict, key: str, stats, ndigits: int = 2):
    """Record seconds as results[key]=median milliseconds and spread."""
    med, lo, hi = stats
    results[key] = round(med * 1e3, ndigits)
    results[key + "_minmax"] = [round(lo * 1e3, ndigits), round(hi * 1e3, ndigits)]
    return results[key]

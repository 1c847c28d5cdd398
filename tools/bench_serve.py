#!/usr/bin/env python
"""Serving latency/throughput (the application.py product path) on the real chip:
full ViT-B/32 + GPT-2-base stack, in-process PredictService (no HTTP overhead),
single-request warm latency and micro-batched concurrent throughput.
"""

from __future__ import annotations

import concurrent.futures as cf
import gzip
import json
import os
import sys
import tempfile
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax

    cache_dir = os.path.expanduser("~/.cache/cctpu_xla")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from construction_clip_tpu.core.configs import ClipCapConfig, GPT2Config, CLIPConfig
    from construction_clip_tpu.data.clip_tokenizer import ClipTokenizer
    from construction_clip_tpu.infer.caption import CaptionPipeline
    from construction_clip_tpu.models.clip import init_clip
    from construction_clip_tpu.models.clipcap import init_clipcap
    from construction_clip_tpu.serve.app import PredictService

    log(f"backend={jax.default_backend()}")
    clip_cfg = CLIPConfig.vit_b_32()
    gcfg = GPT2Config()
    ccfg = ClipCapConfig()

    with tempfile.NamedTemporaryFile(suffix=".txt.gz", delete=False) as f:
        pass
    with gzip.open(f.name, "wt", encoding="utf-8") as g:
        g.write("version\n")

    class IdTok:
        def encode(self, text):
            return [min(ord(c) % 20000 + 100, 21000) for c in text][:20]

        def decode(self, ids, skip_special_tokens=True):
            return "".join(chr(0x4E00 + int(i) % 2000) for i in ids)

    pipe = CaptionPipeline(
        clip_params=init_clip(jax.random.key(0), clip_cfg), clip_cfg=clip_cfg,
        cap_params=init_clipcap(jax.random.key(1), ccfg, gcfg), ccfg=ccfg,
        gcfg=gcfg, clip_tokenizer=ClipTokenizer(f.name, n_merges=None),
        lm_tokenizer=IdTok(), max_steps=100)
    os.unlink(f.name)

    rng = np.random.default_rng(0)
    img = (rng.random((480, 640, 3)) * 255).astype(np.uint8)

    svc = PredictService(pipe, use_beam=False, batch_window_ms=25, max_batch=16)
    # warm the power-of-two batch shapes (app pads each drain to one of these)
    svc.predict(img)
    for n in (2, 4, 8, 16):
        with cf.ThreadPoolExecutor(n) as pool:
            list(pool.map(svc.predict, [img] * n))
    log("warm")

    t0 = time.perf_counter()
    for _ in range(10):
        svc.predict(img)
    lat_ms = (time.perf_counter() - t0) / 10 * 1e3

    N = 96
    lats: list = []

    def timed(i):
        s0 = time.perf_counter()
        svc.predict(img)
        lats.append(time.perf_counter() - s0)

    t0 = time.perf_counter()
    with cf.ThreadPoolExecutor(24) as pool:
        list(pool.map(timed, range(N)))
    thr = N / (time.perf_counter() - t0)
    lats_ms = sorted(l * 1e3 for l in lats)
    p50 = lats_ms[len(lats_ms) // 2]
    p99 = lats_ms[min(len(lats_ms) - 1, int(len(lats_ms) * 0.99))]

    print(json.dumps({"single_request_ms": round(lat_ms, 1),
                      "concurrent_req_s_24way": round(thr, 2),
                      "p50_ms": round(p50, 1), "p99_ms": round(p99, 1),
                      "batch_window_ms": 25, "max_batch": 16}))


if __name__ == "__main__":
    main()

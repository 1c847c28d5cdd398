#!/usr/bin/env python
"""Serving latency/throughput (the application.py product path) on the real chip:
full ViT-B/32 + GPT-2-base stack, in-process PredictService (no HTTP overhead),
single-request warm latency and micro-batched concurrent throughput.

Contracts (state which one a number is!):
  default      classify + caption per request (NullDetector) + the int8 section
  --detector   the reference's FULL route: Faster R-CNN detection + classify +
               caption on EVERY request (application.py:231-254, detection at
               :243), detection coalesced through the same drain batch
  --trained D  load the e2e-trained checkpoints + tokenizers from run dir D
               (tools/run_product_e2e.py output) instead of random weights:
               the PRODUCT-realistic configuration, where peaked logits make
               greedy decode hit EOS after a real caption length and the
               decode while_loop early-exits instead of running all 100 steps

Note on int8_caption_agreement: this bench runs RANDOM weights, where a
100-step greedy decode chaotically amplifies the int8 tower's ~4e-4 feature
perturbation (cosine 0.9996) into different token paths — agreement ~0 is
expected here and is NOT a quantization-quality signal. With trained
checkpoints the peaked logits make decode stable; the feature cosine is the
weight-independent fidelity metric. PROVEN in round 4: with the e2e-trained
checkpoints (runs/e2e/models), bf16 vs int8 caption agreement is 1.0 over 16
images and attribute agreement 1.0 (tools/int8_caption_agreement.py).
"""

from __future__ import annotations

import argparse
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
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--detector", action="store_true",
                    help="bench the FULL reference contract: detection + "
                         "classify + caption per request")
    ap.add_argument("--trained", metavar="RUN_DIR", default=None,
                    help="run dir of a tools/run_product_e2e.py run; bench "
                         "with its trained checkpoints + real tokenizers")
    ap.add_argument("--det_size", type=int, default=800,
                    help="detector staging square (800 = reference min-side "
                         "contract; 512 = documented fast config)")
    ap.add_argument("--det_geometry", default="letterbox",
                    choices=["letterbox", "crop"])
    ap.add_argument("--max_batches", type=int, nargs="*", default=[16, 32],
                    help="max_batch sweep values (H2D-bound configs like the "
                         "800px detector can prefer smaller drains)")
    args = ap.parse_args()

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

    if args.trained:
        # product configuration: the e2e run's fine-tuned CLIP + ClipCap and
        # its real tokenizers. Greedy decode stops at each caption's EOS
        # (decode.py cond: all-done early exit) instead of burning 100 steps.
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "apps"))
        from common import load_clip, load_clip_tokenizer, load_hf_tokenizer
        from construction_clip_tpu.train.checkpoint import load_params_npz

        d = args.trained
        clip_params, clip_cfg = load_clip(
            os.path.join(d, "models", "clip_latest.npz"), arch="vit_b_32")
        cap_params = load_params_npz(
            os.path.join(d, "models", "clipcap.npz"),
            init_clipcap(jax.random.key(1), ccfg, gcfg))
        pipe = CaptionPipeline(
            clip_params=clip_params, clip_cfg=clip_cfg,
            cap_params=cap_params, ccfg=ccfg, gcfg=gcfg,
            clip_tokenizer=load_clip_tokenizer(
                os.path.join(d, "assets", "clip_bpe_offline.txt.gz"),
                expect_vocab=clip_cfg.text.vocab_size),
            lm_tokenizer=load_hf_tokenizer(
                os.path.join(d, "assets", "bert_zh_vocab")),
            max_steps=100)
    else:
        pipe = CaptionPipeline(
            clip_params=init_clip(jax.random.key(0), clip_cfg), clip_cfg=clip_cfg,
            cap_params=init_clipcap(jax.random.key(1), ccfg, gcfg), ccfg=ccfg,
            gcfg=gcfg, clip_tokenizer=ClipTokenizer(f.name, n_merges=None),
            lm_tokenizer=IdTok(), max_steps=100)
    os.unlink(f.name)

    rng = np.random.default_rng(0)
    img = (rng.random((480, 640, 3)) * 255).astype(np.uint8)
    imgs = [(rng.random((480, 640, 3)) * 255).astype(np.uint8) for _ in range(8)]
    if args.trained:
        # serve the run's own corpus images: real class structure -> realistic
        # caption lengths (the early-exit benefit being measured)
        import glob

        from construction_clip_tpu.data.pipeline import default_load_image

        paths = sorted(glob.glob(os.path.join(args.trained, "images", "**", "*"),
                                 recursive=True))
        paths = [p for p in paths if os.path.isfile(p)][:24]
        if paths:
            loaded = [default_load_image(p) for p in paths]
            img, imgs = loaded[0], loaded[:8]
            log(f"trained mode: serving {len(paths)} corpus images from "
                f"{args.trained}/images")

    def warm_shapes(svc):
        """Compile every power-of-two batch shape by calling the pipeline
        DIRECTLY: a cold compile of the B=1 decode loop through the tunnel can
        exceed the batcher's 300 s fail-fast bound (measured this round after
        the decode rewrite invalidated the compile cache), and the batcher
        would then surface a spurious 'did not respond' instead of waiting."""
        from construction_clip_tpu.data.pipeline import host_shape_unify
        from construction_clip_tpu.data.preprocess import preprocess_batch

        size = svc.pipe.clip_cfg.vision.image_size
        staged = host_shape_unify(img, 256)
        # every shape the batcher can pad to: powers of two up to _max_batch,
        # plus _max_batch itself when it is not a power of two (serve/app.py
        # caps padding at min(next_pow2, _max_batch))
        sizes = []
        n = 1
        while n <= svc._max_batch:
            sizes.append(n)
            n *= 2
        if sizes[-1] != svc._max_batch:
            sizes.append(svc._max_batch)
        for n in sizes:
            t0 = time.perf_counter()
            svc.pipe.caption_images(
                preprocess_batch(np.stack([staged] * n), size),
                use_beam=svc.use_beam)
            log(f"warm B={n}: {time.perf_counter() - t0:.1f}s")
        if svc._det_size is not None:
            det_staged = host_shape_unify(img, svc._det_size)
            for n in sizes:
                t0 = time.perf_counter()
                svc._detect_batch([det_staged] * n, [img.shape[:2]] * n)
                log(f"warm det B={n}: {time.perf_counter() - t0:.1f}s")

    def drive(svc):
        """(single-request ms, req/s @ 24-way, p50 ms, p99 ms) for one service."""
        warm_shapes(svc)
        svc.predict(img)  # warm the batcher path itself
        for n in (2, 4, 8, 16, 24):
            with cf.ThreadPoolExecutor(n) as pool:
                list(pool.map(svc.predict, [img] * n))
        log("warm")
        t0 = time.perf_counter()
        for _ in range(10):
            svc.predict(img)
        lat_ms = (time.perf_counter() - t0) / 10 * 1e3
        # 3 independent 24-way windows, report the median-throughput window's
        # stats: single-window numbers swung 32-40 req/s run-to-run on this
        # nproc=1 host (thread-scheduling noise, not device variance)
        N = 96
        trials = []
        for _ in range(3):
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
            trials.append((thr, lats_ms[len(lats_ms) // 2],
                           lats_ms[min(len(lats_ms) - 1,
                                       int(len(lats_ms) * 0.99))]))
        trials.sort()
        thr, p50, p99 = trials[1]
        return (lat_ms, thr, p50, p99,
                [round(t[0], 2) for t in trials])

    # max_batch sweep: at 24-way concurrency max_batch=32 drains every waiting
    # request in ONE device batch (no second-cycle stragglers = the p99 tail),
    # while 16 splits the backlog 16+8 and the 8 wait a full service cycle
    detector = None
    if args.detector:
        from construction_clip_tpu.serve.detector import (JaxDetector,
                                                          ThresholdWrapper)

        # random weights; geometry/size per flags (defaults = the reference
        # contract: letterbox, long-side 800 — no content loss)
        detector = ThresholdWrapper(JaxDetector(
            image_size=args.det_size, geometry=args.det_geometry))
    best = None
    for mb in args.max_batches:
        svc = PredictService(pipe, detector=detector, use_beam=False,
                             batch_window_ms=25, max_batch=mb)
        lat_ms, thr, p50, p99, thr_trials = drive(svc)
        log(f"fp mb={mb}: {thr:.2f} req/s p50={p50:.0f} p99={p99:.0f} "
            f"trials={thr_trials}")
        if best is None or thr > best[1]:
            best = (mb, thr, lat_ms, p50, p99, thr_trials, svc)
    mb, thr, lat_ms, p50, p99, thr_trials, svc = best
    results = {"contract": ("detect+classify+caption" if args.detector
                            else "classify+caption"),
               **({"det_size": args.det_size,
                   "det_geometry": args.det_geometry} if args.detector else {}),
               "weights": (f"trained({args.trained})" if args.trained
                           else "random"),
               "single_request_ms": round(lat_ms, 1),
               "concurrent_req_s_24way": round(thr, 2),
               "req_s_trials": thr_trials,
               "p50_ms": round(p50, 1), "p99_ms": round(p99, 1),
               "batch_window_ms": 25, "max_batch": mb}
    log(f"fp best: {results}")
    if args.trained:
        # caption-length evidence for the early-exit effect (and a sanity
        # check that the model is producing real text, not collapse)
        caps = [svc.predict(i)["caption"] for i in imgs]
        results["caption_lengths"] = [len(c) for c in caps]
        results["unique_captions"] = len(set(caps))
        print(json.dumps(results, ensure_ascii=False))
        return
    if args.detector:  # int8 section is the default contract's job
        print(json.dumps(results))
        return

    # int8 configuration (the apps/serve.py --int8 path): quantized CLIP image
    # tower + weight-only int8 GPT-2. Parity vs the bf16 service on 8 images:
    # cosine of the CLIP features driving the prefix, and caption agreement.
    from dataclasses import replace as dc_replace

    from construction_clip_tpu.models.clip.quant import quantize_clip
    from construction_clip_tpu.models.gpt2 import quantize_gpt2

    from construction_clip_tpu.data.pipeline import host_shape_unify
    from construction_clip_tpu.data.preprocess import preprocess_batch

    qpipe = dc_replace(pipe, clip_params=quantize_clip(pipe.clip_params),
                       cap_params=dict(pipe.cap_params,
                                       gpt=quantize_gpt2(pipe.cap_params["gpt"])))
    size = pipe.clip_cfg.vision.image_size
    staged = preprocess_batch(
        np.stack([host_shape_unify(i, 256) for i in imgs]), size)
    bf16_feats = np.asarray(pipe.classify_and_embed(staged)[0], np.float32)
    int8_feats = np.asarray(qpipe.classify_and_embed(staged)[0], np.float32)
    cos = float(np.mean(np.sum(bf16_feats * int8_feats, axis=-1)
                        / (np.linalg.norm(bf16_feats, axis=-1)
                           * np.linalg.norm(int8_feats, axis=-1))))
    caps_fp = [svc.predict(i)["caption"] for i in imgs]

    qsvc = PredictService(qpipe, use_beam=False, batch_window_ms=25,
                          max_batch=mb)
    caps_q = [qsvc.predict(i)["caption"] for i in imgs]
    agree = float(np.mean([a == b for a, b in zip(caps_fp, caps_q)]))
    qlat, qthr, qp50, qp99, qtrials = drive(qsvc)
    results.update({"int8_single_request_ms": round(qlat, 1),
                    "int8_concurrent_req_s_24way": round(qthr, 2),
                    "int8_req_s_trials": qtrials,
                    "int8_p50_ms": round(qp50, 1), "int8_p99_ms": round(qp99, 1),
                    "int8_caption_cos": round(cos, 4),
                    "int8_caption_agreement": agree})
    print(json.dumps(results))


if __name__ == "__main__":
    main()

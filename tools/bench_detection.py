#!/usr/bin/env python
"""Faster R-CNN train-step + inference benchmark on the real chip.

The reference serves a fine-tuned torchvision fasterrcnn_resnet50_fpn
(reference application.py:13-25, trained outside the repo); this framework
also TRAINS it (train/detection.py, torchvision-pinned losses). This tool
records the single-chip step time for both loss regimes and the batched
inference rate the serving path uses. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from bench_util import log, put_ms, put_rate, setup_jax_cache, timed_windows


def main():
    import jax

    setup_jax_cache()
    import jax.numpy as jnp
    import numpy as np
    import optax

    from construction_clip_tpu.models.detection import (fasterrcnn_infer,
                                                        init_fasterrcnn)
    from construction_clip_tpu.train.detection import (DetectionBatch,
                                                       make_detection_train_step)
    from construction_clip_tpu.train.state import TrainState

    log(f"backend={jax.default_backend()}")
    results = {}
    # 512 px is the serving default (serve/detector.py JaxDetector image_size)
    B, S, C = 8, 512, 6
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((B, S, S, 3)).astype(np.float32))
    gt_boxes = jnp.asarray(
        np.tile(np.array([[[40.0, 40.0, 200.0, 200.0],
                           [100.0, 260.0, 300.0, 460.0]]], np.float32),
                (B, 1, 1)))
    gt_labels = jnp.asarray(np.tile(np.array([[1, 3]], np.int32), (B, 1)))
    batch = DetectionBatch(images=imgs, gt_boxes=gt_boxes, gt_labels=gt_labels)

    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-4))

    for tag, tv in (("fast", False), ("tv_faithful", True)):
        try:
            # fresh params per phase: the step donates its state, so buffers
            # from a previous phase are deleted after the first call
            params = init_fasterrcnn(jax.random.key(0), num_classes=C)
            step = make_detection_train_step(tx, image_size=S, num_classes=C,
                                             tv_faithful=tv)
            state = TrainState.create(params, tx)
            holder = [state]
            k = jax.random.key(1)

            def one():
                s, m = step(holder[0], batch, k)
                holder[0] = s
                return m["loss"]

            st = timed_windows(one, windows=5, iters=3, warmup=3,
                               sync=lambda o: np.asarray(o))
            put_ms(results, f"det_step_ms_b{B}_{tag}", st, ndigits=1)
            put_rate(results, f"det_img_s_b{B}_{tag}", st, B)
            log(f"detection step b={B} {tag}: {st[0]*1e3:.1f} ms "
                f"[{st[1]*1e3:.1f},{st[2]*1e3:.1f}] ({B/st[0]:.1f} img/s)")
            del state, step, holder
        except Exception as e:
            log(f"{tag}: {type(e).__name__}: {str(e)[:300]}")
            results[f"det_{tag}_error"] = type(e).__name__

    # batched inference (the serve/detector.py path, vmapped over the batch)
    import functools

    params = init_fasterrcnn(jax.random.key(0), num_classes=C)
    fwd = jax.jit(jax.vmap(
        functools.partial(fasterrcnn_infer, image_size=S, num_classes=C),
        in_axes=(None, 0)))

    def infer():
        return fwd(params, imgs)

    out = infer()
    st = timed_windows(infer, windows=5, iters=3, warmup=3,
                       sync=lambda o: np.asarray(jax.tree.leaves(o)[0]))
    put_ms(results, f"det_infer_ms_b{B}", st, ndigits=1)
    put_rate(results, f"det_infer_img_s_b{B}", st, B)
    log(f"detection inference b={B}: {st[0]*1e3:.1f} ms ({B/st[0]:.1f} img/s)")

    # bf16 compute (the JaxDetector serving default on TPU): backbone/heads
    # on the MXU in bf16, box arithmetic fp32 (models/detection.py round 4)
    import jax.numpy as jnp

    fwd16 = jax.jit(jax.vmap(
        functools.partial(fasterrcnn_infer, image_size=S, num_classes=C,
                          compute_dtype=jnp.bfloat16),
        in_axes=(None, 0)))

    def infer16():
        return fwd16(params, imgs)

    infer16()
    st = timed_windows(infer16, windows=5, iters=3, warmup=3,
                       sync=lambda o: np.asarray(jax.tree.leaves(o)[0]))
    put_ms(results, f"det_infer_bf16_ms_b{B}", st, ndigits=1)
    put_rate(results, f"det_infer_bf16_img_s_b{B}", st, B)
    log(f"detection inference bf16 b={B}: {st[0]*1e3:.1f} ms ({B/st[0]:.1f} img/s)")
    del fwd, fwd16, imgs

    # the REFERENCE serving resolution: torchvision's transform puts the min
    # side at 800 (application.py:55-61 -> GeneralizedRCNNTransform defaults);
    # JaxDetector's round-5 default letterboxes the long side to 800. bf16 =
    # the serving config at that geometry; 512 above is the documented fast
    # config (PARITY.md).
    S8, B8 = 800, 4
    imgs800 = jnp.asarray(rng.random((B8, S8, S8, 3)).astype(np.float32))
    fwd800 = jax.jit(jax.vmap(
        functools.partial(fasterrcnn_infer, image_size=S8, num_classes=C,
                          compute_dtype=jnp.bfloat16),
        in_axes=(None, 0)))

    def infer800():
        return fwd800(params, imgs800)

    infer800()
    st = timed_windows(infer800, windows=5, iters=3, warmup=3,
                       sync=lambda o: np.asarray(jax.tree.leaves(o)[0]))
    put_ms(results, f"det_infer_bf16_ms_b{B8}_s800", st, ndigits=1)
    put_rate(results, f"det_infer_bf16_img_s_b{B8}_s800", st, B8)
    log(f"detection inference bf16 b={B8} s=800: {st[0]*1e3:.1f} ms "
        f"({B8/st[0]:.1f} img/s)")

    print(json.dumps(results))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Contrastive CLIP fine-tune on plain (image, caption) pairs — the
`CLIP/train_caption.py` entry point (reference train_caption.py:64-180).

Reference defaults preserved: key violation_list, batch size 8 (train_caption.py:82-83),
same symmetric InfoNCE / AdamW 1e-5 / warmup 5000 as CLIP/train.py. Global batch is
bs * n_devices, sharded over the mesh with all-gathered logits.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from common import enable_compilation_cache, load_clip, load_clip_tokenizer


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--json_path", default="../all.json")
    p.add_argument("--image_path", default="../")
    p.add_argument("--key", default="violation_list")
    p.add_argument("--train_ratio", type=float, default=0.8)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--warmup_steps", type=int, default=5000)
    p.add_argument("--epochs", type=int, default=1000)
    p.add_argument("--save_every", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=8, help="per-device")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--clip_bpe", default=None)
    p.add_argument("--arch", default="vit_b_32",
                   choices=["vit_b_32", "vit_b_16", "vit_l_14", "tiny", "tiny_bpe"])
    p.add_argument("--precision", default="bf16", choices=["bf16", "fp32"])
    p.add_argument("--output_dir", default="models")
    p.add_argument("--output_prefix", default="clip_cap")
    p.add_argument("--resume", default=None)
    p.add_argument("--log_dir", default="log")
    p.add_argument("--native_loader", action="store_true",
                   help="decode JPEGs with the C++ libjpeg ingest (native/)")
    args = p.parse_args()

    enable_compilation_cache()
    import jax

    from construction_clip_tpu.core.mesh import create_mesh, DATA_AXIS, MODEL_AXIS, replicate
    from construction_clip_tpu.core.precision import policy_from_name
    from construction_clip_tpu.data.datasets import CaptionPairDataset
    from construction_clip_tpu.data.pipeline import ImageTextLoader, default_load_image
    from construction_clip_tpu.data.preprocess import preprocess_batch
    from construction_clip_tpu.train.contrastive import make_train_step, make_eval_step
    from construction_clip_tpu.train.state import TrainState, make_adamw
    from construction_clip_tpu.train.checkpoint import save_state, restore_state, latest_step
    from construction_clip_tpu.train.metrics import MetricLogger, StepTimer

    params, cfg = load_clip(args.checkpoint, arch=args.arch)
    tokenizer = load_clip_tokenizer(args.clip_bpe, expect_vocab=cfg.text.vocab_size if args.checkpoint else None)
    policy = policy_from_name(args.precision)
    n_dev = len(jax.devices())
    mesh = create_mesh({DATA_AXIS: n_dev, MODEL_AXIS: 1})

    def make_loader(split):
        ds = CaptionPairDataset(args.json_path, key=args.key, split=split,
                                train_ratio=args.train_ratio)
        if args.native_loader:
            from construction_clip_tpu.data.native_loader import load_image_native

            load = lambda f: load_image_native(os.path.join(args.image_path, f), 256)
        else:
            load = lambda f: default_load_image(os.path.join(args.image_path, f))
        return ImageTextLoader(
            ds, lambda texts: tokenizer.tokenize(texts, cfg.text.context_length),
            batch_size=args.batch_size * n_dev, mesh=mesh, load_image=load)

    train_loader, test_loader = make_loader("train"), make_loader("test")
    tx = make_adamw(args.lr, warmup_steps=args.warmup_steps,
                    total_steps=args.epochs * max(len(train_loader), 1))
    step_fn = make_train_step(cfg, tx, mesh, policy=policy)
    eval_fn = make_eval_step(cfg, mesh, policy=policy)

    state = TrainState.create(replicate(mesh, params), tx)
    if args.resume and latest_step(args.resume) is not None:
        state = restore_state(args.resume, state)

    logger = MetricLogger(args.log_dir, args.output_prefix)
    timer = StepTimer()
    size = cfg.vision.image_size
    os.makedirs(args.output_dir, exist_ok=True)
    for epoch in range(args.epochs):
        for batch in train_loader:
            batch = {"images": preprocess_batch(batch["images"], size),
                     "tokens": batch["tokens"]}
            state, m = step_fn(state, batch)
            timer.tick()
            s = int(state.step)
            if s % 10 == 0:
                logger.log(s, loss=float(m["loss"]), accuracy=float(m["accuracy"]),
                           step_time=timer.mean)
                print(f"epoch {epoch} step {s} loss {float(m['loss']):.4f} "
                      f"acc {float(m['accuracy']):.3f}")
        if (epoch + 1) % args.save_every == 0:
            accs = [float(eval_fn(state.params,
                                  {"images": preprocess_batch(b["images"], size),
                                   "tokens": b["tokens"]})) for b in test_loader]
            logger.log(int(state.step),
                       test_accuracy=float(np.mean(accs)) if accs else 0.0)
            save_state(os.path.join(args.output_dir, args.output_prefix), state)
    logger.close()


if __name__ == "__main__":
    main()

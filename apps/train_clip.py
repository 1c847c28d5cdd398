#!/usr/bin/env python
"""Contrastive CLIP fine-tune on class-balanced N-way pairs — the `CLIP/train.py`
entry point (reference CLIP/train.py:101-217), TPU-native.

Reference defaults preserved: key violation_type, combination_num 9, lr 1e-5,
warmup 5000, epochs 1000, save_every 100, train_ratio 0.8, seed 567. The reference's
"batch" is ONE class-balanced group of 9 images (bs=1, CLIP/train.py:120); here
--groups_per_batch packs multiple groups into a global batch sharded over the mesh.
"""

from __future__ import annotations

import argparse
import os
import sys

from common import enable_compilation_cache, load_clip, load_clip_tokenizer


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--json_path", default="../all.json")
    p.add_argument("--image_path", default="../")
    p.add_argument("--key", default="violation_type",
                   choices=["violation_type", "caption_type", "violation_list", "caption"])
    p.add_argument("--combination_num", type=int, default=9)
    p.add_argument("--train_ratio", type=float, default=0.8)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--warmup_steps", type=int, default=5000)
    p.add_argument("--epochs", type=int, default=1000)
    p.add_argument("--save_every", type=int, default=100)
    p.add_argument("--groups_per_batch", type=int, default=1)
    p.add_argument("--output_dir", default="models")
    p.add_argument("--output_prefix", default="clip")
    p.add_argument("--checkpoint", default=None, help=".pt (OpenAI/HF/fine-tuned) or .npz")
    p.add_argument("--clip_bpe", default=None, help="path to bpe_simple_vocab_16e6.txt.gz")
    p.add_argument("--arch", default="vit_b_32",
                   choices=["vit_b_32", "vit_b_16", "vit_l_14", "tiny", "tiny_bpe"])
    p.add_argument("--precision", default="bf16", choices=["bf16", "fp32"])
    p.add_argument("--resume", default=None, help="orbax checkpoint dir to resume from")
    p.add_argument("--log_dir", default="log")
    p.add_argument("--native_loader", action="store_true",
                   help="decode JPEGs with the C++ libjpeg ingest (native/)")
    p.add_argument("--watchdog_timeout", type=float, default=600.0,
                   help="seconds without step progress before a stall is logged")
    args = p.parse_args()

    enable_compilation_cache()
    import jax
    import numpy as np

    from construction_clip_tpu.core.mesh import create_mesh, DATA_AXIS, MODEL_AXIS, replicate
    from construction_clip_tpu.core.precision import policy_from_name
    from construction_clip_tpu.data.datasets import PairGroupDataset
    from construction_clip_tpu.data.pipeline import ImageTextLoader, default_load_image
    from construction_clip_tpu.data.preprocess import preprocess_batch
    from construction_clip_tpu.train.contrastive import make_train_step, make_eval_step
    from construction_clip_tpu.train.state import TrainState, make_adamw
    from construction_clip_tpu.train.checkpoint import save_state, restore_state, latest_step
    from construction_clip_tpu.train.metrics import MetricLogger, StepTimer

    params, cfg = load_clip(args.checkpoint, arch=args.arch)
    tokenizer = load_clip_tokenizer(args.clip_bpe, expect_vocab=cfg.text.vocab_size if args.checkpoint else None)
    policy = policy_from_name(args.precision)

    import math

    # the per-step batch is groups_per_batch class-balanced groups of
    # combination_num images each; the data axis must divide it (reference runs
    # one 9-image group per step, CLIP/train.py:120 — indivisible by e.g. 8 chips)
    step_batch = args.groups_per_batch * args.combination_num
    n_dev = math.gcd(len(jax.devices()), step_batch)
    if n_dev < len(jax.devices()):
        print(f"note: using {n_dev}/{len(jax.devices())} devices — step batch "
              f"{step_batch} must be divisible by the data axis "
              f"(raise --groups_per_batch to use more chips)")
    mesh = create_mesh({DATA_AXIS: n_dev, MODEL_AXIS: 1},
                       devices=jax.devices()[:n_dev])
    print(f"mesh: {n_dev} x {jax.devices()[0].platform}")

    train_ds = PairGroupDataset(args.json_path, key=args.key, split="train",
                                train_ratio=args.train_ratio,
                                combination_num=args.combination_num)
    test_ds = PairGroupDataset(args.json_path, key=args.key, split="test",
                               train_ratio=args.train_ratio,
                               combination_num=args.combination_num)

    def tokenize(texts):
        return tokenizer.tokenize(texts, cfg.text.context_length)

    def make_loader(ds):
        if args.native_loader:
            from construction_clip_tpu.data.native_loader import load_image_native

            load = lambda f: load_image_native(os.path.join(args.image_path, f), 256)
        else:
            load = lambda f: default_load_image(os.path.join(args.image_path, f))
        return ImageTextLoader(ds, tokenize, batch_size=args.groups_per_batch,
                               mesh=mesh, load_image=load)

    train_loader, test_loader = make_loader(train_ds), make_loader(test_ds)
    steps_per_epoch = len(train_loader)
    tx = make_adamw(args.lr, warmup_steps=args.warmup_steps,
                    total_steps=args.epochs * max(steps_per_epoch, 1))
    step_fn = make_train_step(cfg, tx, mesh, policy=policy)
    eval_fn = make_eval_step(cfg, mesh, policy=policy)

    state = TrainState.create(replicate(mesh, params), tx)
    if args.resume and latest_step(args.resume) is not None:
        state = restore_state(args.resume, state)
        print(f"resumed from {args.resume} at step {int(state.step)}")

    from construction_clip_tpu.train.resilience import StepWatchdog, run_resilient

    logger = MetricLogger(args.log_dir, f"{args.output_prefix}_comb{args.combination_num}")
    timer = StepTimer()
    size = cfg.vision.image_size
    os.makedirs(args.output_dir, exist_ok=True)
    ckpt_dir = os.path.join(args.output_dir,
                            f"{args.output_prefix}_comb{args.combination_num}")

    with StepWatchdog(timeout=args.watchdog_timeout) as watchdog:
        def train_epoch(state, epoch):
            m = None
            for batch in train_loader:
                batch = {"images": preprocess_batch(batch["images"], size),
                         "tokens": batch["tokens"]}
                state, m = step_fn(state, batch)
                timer.tick()
                watchdog.tick()
                s = int(state.step)
                if s % 10 == 0:
                    logger.log(s, loss=float(m["loss"]), accuracy=float(m["accuracy"]),
                               step_time=timer.mean)
                    print(f"epoch {epoch} step {s} loss {float(m['loss']):.4f} "
                          f"acc {float(m['accuracy']):.3f} {timer.mean*1e3:.0f} ms/step")
            if m is None:
                raise RuntimeError(
                    f"epoch {epoch} ran zero steps — dataset produced no groups "
                    f"(need >= {args.combination_num} distinct --key classes)")
            # epoch-end point so short runs still record a loss curve
            logger.log(int(state.step), loss=float(m["loss"]),
                       accuracy=float(m["accuracy"]), step_time=timer.mean)
            if (epoch + 1) % args.save_every == 0:
                accs = [float(eval_fn(state.params,
                                      {"images": preprocess_batch(b["images"], size),
                                       "tokens": b["tokens"]}))
                        for b in test_loader]
                logger.log(int(state.step),
                           test_accuracy=float(np.mean(accs)) if accs else 0.0)
            return state

        state = run_resilient(train_epoch, state, epochs=args.epochs,
                              checkpoint_dir=ckpt_dir,
                              save_every_epochs=args.save_every)
    # inference artifact: fine-tuned params as npz — the `clip_latest.pt` of the
    # reference pipeline (CLIP/train.py:211-217 -> parse_coco.py:21); consumed by
    # apps/parse_corpus.py --checkpoint and apps/predict.py --clip_checkpoint
    from construction_clip_tpu.train.checkpoint import save_params_npz

    npz_path = os.path.join(args.output_dir, f"{args.output_prefix}_latest.npz")
    save_params_npz(npz_path, state.params)
    print(f"saved inference params {npz_path}")
    logger.close()


if __name__ == "__main__":
    main()

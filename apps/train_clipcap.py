#!/usr/bin/env python
"""ClipCap prefix-caption training — the `CLIP_prefix_caption/train.py` entry point.

Flag surface mirrors the reference argparse (reference CLIP_prefix_caption/
train.py:386-402) flag for flag; --data takes this framework's .npz embedding archive
(from apps/parse_corpus.py) instead of the torch pickle.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from common import enable_compilation_cache, load_hf_tokenizer


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data", default="./embedding/ViT-B_32_train_embedding.npz")
    p.add_argument("--out_dir", default="./models")
    p.add_argument("--prefix", default="coco_prefix_ct", help="prefix for saved filenames")
    p.add_argument("--epochs", type=int, default=400)
    p.add_argument("--save_every", type=int, default=100)
    p.add_argument("--prefix_length", type=int, default=20)
    p.add_argument("--attribute_length", type=int, default=20)
    p.add_argument("--prefix_length_clip", type=int, default=20)
    p.add_argument("--bs", type=int, default=1)
    p.add_argument("--only_prefix", action="store_true")
    p.add_argument("--mapping_type", type=str, default="mlp", help="mlp/transformer")
    p.add_argument("--num_layers", type=int, default=8)
    p.add_argument("--is_rn", action="store_true")
    p.add_argument("--normalize_prefix", action="store_true")
    p.add_argument("--tokenizer", type=str, default="ckiplab/gpt2-base-chinese")
    # framework extensions
    p.add_argument("--lr", type=float, default=2e-5)
    p.add_argument("--warmup_steps", type=int, default=5000)
    p.add_argument("--gpt_checkpoint", default=None,
                   help="HF GPT-2 .pt/.bin state dict to start the LM from")
    p.add_argument("--gpt_size", default="base", choices=["base", "tiny"],
                   help="tiny = test-scale decoder")
    p.add_argument("--precision", default="bf16", choices=["bf16", "fp32"])
    p.add_argument("--resume", default=None)
    p.add_argument("--log_dir", default="log")
    args = p.parse_args()

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import optax

    from construction_clip_tpu.core.configs import ClipCapConfig, GPT2Config
    from construction_clip_tpu.core.mesh import create_mesh, DATA_AXIS, MODEL_AXIS, replicate
    from construction_clip_tpu.core.precision import policy_from_name
    from construction_clip_tpu.data.pipeline import ArrayLoader
    from construction_clip_tpu.infer.precompute import tokenize_for_caption_training
    from construction_clip_tpu.models.clipcap import init_clipcap
    from construction_clip_tpu.models import gpt2 as gpt2_lib
    from construction_clip_tpu.train.caption import make_caption_train_step
    from construction_clip_tpu.train.state import TrainState, make_adamw
    from construction_clip_tpu.train.checkpoint import save_state, restore_state, latest_step
    from construction_clip_tpu.train.metrics import MetricLogger, StepTimer

    gcfg = GPT2Config() if args.gpt_size == "base" else GPT2Config.tiny()
    policy = policy_from_name(args.precision)

    from construction_clip_tpu.infer.precompute import load_archive

    archive = load_archive(args.data)  # our .npz or the reference's .pkl
    # prefix dim from the archive itself (reference hardcodes 640-if-RN/512,
    # train.py:407 — kept as the fallback when the archive is empty)
    clip_dim = archive["embeddings"].shape[-1] if len(archive["embeddings"]) \
        else (640 if args.is_rn else 512)
    ccfg = ClipCapConfig(
        prefix_length=args.prefix_length, attribute_length=args.attribute_length,
        clip_dim=int(clip_dim), mapper=args.mapping_type,
        mapper_layers=args.num_layers, clip_length=args.prefix_length_clip,
        only_prefix=args.only_prefix)
    tokenizer = load_hf_tokenizer(args.tokenizer)
    arrays = tokenize_for_caption_training(archive, tokenizer,
                                           attribute_length=args.attribute_length)
    if args.normalize_prefix:
        n = np.linalg.norm(arrays["prefix"], axis=-1, keepdims=True)
        arrays["prefix"] = arrays["prefix"] / np.maximum(n, 1e-6)
    print(f"{len(arrays['prefix'])} items, caption len {arrays['tokens'].shape[1]}")

    n_dev = len(jax.devices())
    mesh = create_mesh({DATA_AXIS: n_dev, MODEL_AXIS: 1})
    gpt_params = None
    if args.gpt_checkpoint:
        from construction_clip_tpu.models.clip.convert import load_torch_checkpoint

        gpt_params = gpt2_lib.from_hf_state_dict(
            load_torch_checkpoint(args.gpt_checkpoint), gcfg)
    params = init_clipcap(jax.random.key(567), ccfg, gcfg, gpt_params=gpt_params)
    print("Train only prefix" if args.only_prefix else "Train both prefix and GPT")

    loader = ArrayLoader(arrays, batch_size=args.bs * n_dev, mesh=mesh)
    total = args.epochs * max(len(loader), 1)
    tx = make_adamw(args.lr, warmup_steps=args.warmup_steps, total_steps=total)
    step_fn = make_caption_train_step(ccfg, gcfg, tx, mesh, policy=policy)

    if args.only_prefix:
        trainable = params["mapper"]
        frozen = replicate(mesh, params["gpt"])
    else:
        trainable = params
        frozen = None
    state = TrainState.create(replicate(mesh, trainable), tx)
    if args.resume and latest_step(args.resume) is not None:
        state = restore_state(args.resume, state)
        print(f"resumed at step {int(state.step)}")

    os.makedirs(args.out_dir, exist_ok=True)
    logger = MetricLogger(args.log_dir, args.prefix)
    timer = StepTimer()

    from construction_clip_tpu.train.resilience import StepWatchdog, run_resilient

    with StepWatchdog(timeout=600.0) as watchdog:
        def train_epoch(state, epoch):
            m = None
            for batch in loader:
                state, m = step_fn(state, frozen, batch)
                timer.tick()
                watchdog.tick()
                s = int(state.step)
                if s % 50 == 0:
                    logger.log(s, loss=float(m["loss"]), step_time=timer.mean)
                    print(f"epoch {epoch} step {s} loss {float(m['loss']):.4f} "
                          f"{timer.mean*1e3:.0f} ms/step")
            if m is None:
                raise RuntimeError(
                    f"epoch {epoch} ran zero steps: global batch "
                    f"{args.bs} x {n_dev} devices > {len(arrays['prefix'])} "
                    f"archive items — lower --bs or the device count")
            # epoch-end point so short runs still record a loss curve
            logger.log(int(state.step), loss=float(m["loss"]), step_time=timer.mean)
            return state

        state = run_resilient(train_epoch, state, epochs=args.epochs,
                              checkpoint_dir=os.path.join(args.out_dir, args.prefix),
                              save_every_epochs=args.save_every)
    # inference artifact: full {mapper, gpt} params as npz (apps/predict.py input)
    from construction_clip_tpu.train.checkpoint import save_params_npz

    final = ({"mapper": state.params, "gpt": params["gpt"]} if args.only_prefix
             else state.params)
    npz_path = os.path.join(args.out_dir, f"{args.prefix}.npz")
    save_params_npz(npz_path, final)
    print(f"saved inference params {npz_path}")
    logger.close()


if __name__ == "__main__":
    main()

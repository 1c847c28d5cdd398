#!/usr/bin/env python
"""ClipCap mT5 caption training — the `CLIP_prefix_caption/train_t5.py` entry point
(reference train_t5.py:409-440): same flag surface as train_clipcap plus the T5
tokenizer choice; lr 1e-4 / warmup 5000 (reference train_t5.py:332).

mT5's sentencepiece tokenizer is not in this image — pass a tokenizers-json file
(apps/train_tokenizer.py output, the reference's custom-tokenizer workflow) or an HF
name when online.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from common import enable_compilation_cache, fit_t5_vocab, load_hf_tokenizer


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data", default="./embedding/ViT-B_32_train_embedding.npz")
    p.add_argument("--out_dir", default="./models")
    p.add_argument("--prefix", default="t5_prefix_ct")
    p.add_argument("--epochs", type=int, default=400)
    p.add_argument("--save_every", type=int, default=100)
    p.add_argument("--prefix_length", type=int, default=20)
    p.add_argument("--prefix_length_clip", type=int, default=20)
    p.add_argument("--bs", type=int, default=40)
    p.add_argument("--only_prefix", action="store_true")
    p.add_argument("--mapping_type", default="mlp")
    p.add_argument("--num_layers", type=int, default=8)
    p.add_argument("--normalize_prefix", action="store_true")
    p.add_argument("--tokenizer", default="chinese_bpe.json",
                   help="tokenizers json (train_tokenizer.py) or HF name")
    p.add_argument("--max_length", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--warmup_steps", type=int, default=5000)
    p.add_argument("--t5_size", default="small", choices=["small", "tiny"])
    p.add_argument("--t5_checkpoint", default=None)
    p.add_argument("--precision", default="bf16", choices=["bf16", "fp32"])
    p.add_argument("--resume", default=None)
    p.add_argument("--log_dir", default="log")
    args = p.parse_args()

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from construction_clip_tpu.core.configs import ClipCapConfig, T5Config
    from construction_clip_tpu.core.mesh import create_mesh, DATA_AXIS, MODEL_AXIS, replicate
    from construction_clip_tpu.core.precision import policy_from_name
    from construction_clip_tpu.data.pipeline import ArrayLoader
    from construction_clip_tpu.models import t5 as t5_lib
    from construction_clip_tpu.models.clipcap.t5_model import init_clipcap_t5
    from construction_clip_tpu.train.t5 import make_t5_caption_train_step
    from construction_clip_tpu.train.state import TrainState, make_adamw
    from construction_clip_tpu.train.checkpoint import save_state, restore_state, latest_step
    from construction_clip_tpu.train.metrics import MetricLogger, StepTimer

    from construction_clip_tpu.infer.precompute import load_archive

    tokenizer = load_hf_tokenizer(args.tokenizer)
    tcfg = T5Config() if args.t5_size == "small" else T5Config.tiny()
    tcfg = fit_t5_vocab(tcfg, tokenizer)
    archive = load_archive(args.data)  # our .npz or the reference's .pkl

    # captions tokenized to max_length (reference ClipCocoDataset, train_t5.py:75)
    ids = np.zeros((len(archive["captions"]), args.max_length), np.int32)
    for i, c in enumerate(archive["captions"]):
        enc = tokenizer.encode(str(c))[: args.max_length]
        ids[i, : len(enc)] = enc
    arrays = {"input_ids": ids,
              "attention_mask": (ids != 0).astype(np.int32),
              "prefix": archive["embeddings"].astype(np.float32)}
    if args.normalize_prefix:
        n = np.linalg.norm(arrays["prefix"], axis=-1, keepdims=True)
        arrays["prefix"] /= np.maximum(n, 1e-6)

    ccfg = ClipCapConfig(prefix_length=args.prefix_length, attribute_length=0,
                         clip_dim=arrays["prefix"].shape[-1],
                         mapper=args.mapping_type, mapper_layers=args.num_layers,
                         clip_length=args.prefix_length_clip,
                         only_prefix=args.only_prefix)
    policy = policy_from_name(args.precision)

    n_dev = len(jax.devices())
    mesh = create_mesh({DATA_AXIS: n_dev, MODEL_AXIS: 1})
    t5_params = None
    if args.t5_checkpoint:
        from construction_clip_tpu.models.clip.convert import load_torch_checkpoint

        t5_params = t5_lib.from_hf_state_dict(
            load_torch_checkpoint(args.t5_checkpoint), tcfg)
    params = init_clipcap_t5(jax.random.key(567), ccfg, tcfg, t5_params=t5_params)

    loader = ArrayLoader(arrays, batch_size=args.bs * n_dev, mesh=mesh)
    tx = make_adamw(args.lr, warmup_steps=args.warmup_steps,
                    total_steps=args.epochs * max(len(loader), 1))
    step_fn = make_t5_caption_train_step(ccfg, tcfg, tx, mesh, policy=policy)

    if args.only_prefix:
        trainable, frozen = params["mapper"], replicate(mesh, params["t5"])
        print("Train only prefix")
    else:
        trainable, frozen = params, None
        print("Train both prefix and T5")
    state = TrainState.create(replicate(mesh, trainable), tx)
    if args.resume and latest_step(args.resume) is not None:
        state = restore_state(args.resume, state)

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
                    print(f"epoch {epoch} step {s} loss {float(m['loss']):.4f}")
            if m is None:
                raise RuntimeError(
                    f"epoch {epoch} ran zero steps: global batch "
                    f"{args.bs} x {n_dev} devices > archive size — lower --bs "
                    f"or the device count")
            # epoch-end point so short runs still record a loss curve
            logger.log(int(state.step), loss=float(m["loss"]), step_time=timer.mean)
            return state

        state = run_resilient(train_epoch, state, epochs=args.epochs,
                              checkpoint_dir=os.path.join(args.out_dir, args.prefix),
                              save_every_epochs=args.save_every)
    # inference artifact for apps/predict_t5.py
    from construction_clip_tpu.train.checkpoint import save_params_npz

    final = ({"mapper": state.params, "t5": params["t5"]} if args.only_prefix
             else state.params)
    npz_path = os.path.join(args.out_dir, f"{args.prefix}.npz")
    save_params_npz(npz_path, final)
    print(f"saved inference params {npz_path}")
    logger.close()


if __name__ == "__main__":
    main()

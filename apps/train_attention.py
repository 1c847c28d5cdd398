#!/usr/bin/env python
"""Show-attend-tell training — the `attention_model/train.py` entry point.

Reference hyperparameters preserved (reference attention_model/train.py:112-118,26-38):
embed 300, attention 256, encoder 2048, decoder 512, lr 3e-4, 25 epochs, ImageNet
normalization, CE on captions[:,1:]; checkpoint includes optimizer state + epoch
(train.py:184-193 — the only reference trainer that saves resume state).
Encoder = frozen ResNet50 features (pass --resnet_checkpoint for torchvision weights);
features are precomputed per batch on device.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from common import enable_compilation_cache


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--json_path", default="../all.json")
    p.add_argument("--image_root", default="../")
    p.add_argument("--caption_key", default="caption")
    p.add_argument("--embed_size", type=int, default=300)
    p.add_argument("--attention_dim", type=int, default=256)
    p.add_argument("--decoder_dim", type=int, default=512)
    p.add_argument("--freq_threshold", type=int, default=5)
    p.add_argument("--max_len", type=int, default=32)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--epochs", type=int, default=25)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--resnet_checkpoint", default=None,
                   help="torchvision resnet50 state dict (.pth)")
    p.add_argument("--output_dir", default="models/attention")
    p.add_argument("--resume", default=None)
    p.add_argument("--log_dir", default="log")
    args = p.parse_args()

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import optax

    from construction_clip_tpu.data.pipeline import (
        ImageTextLoader, default_load_image)
    from construction_clip_tpu.data.preprocess import (
        preprocess_batch, IMAGENET_MEAN, IMAGENET_STD)
    from construction_clip_tpu.data.schema import load_annotations
    from construction_clip_tpu.data.vocabulary import Vocabulary
    from construction_clip_tpu.models.resnet import (
        resnet50_features, init_resnet50, from_torchvision_state_dict)
    from construction_clip_tpu.models.lstm_captioner import (
        init_lstm_captioner, captioner_forward, caption_lm_loss)
    from construction_clip_tpu.train.state import TrainState, apply_gradients
    from construction_clip_tpu.train.checkpoint import save_state, restore_state, latest_step
    from construction_clip_tpu.train.metrics import MetricLogger, StepTimer

    anns = [a for a in load_annotations(args.json_path)
            if (a.caption or a.violation_list)]
    captions = [a.caption or a.violation_list for a in anns]
    vocab = Vocabulary(args.freq_threshold)
    vocab.build_vocabulary(captions)
    print(f"{len(anns)} captions, vocab {len(vocab)}")

    class DS:
        def __len__(self):
            return len(anns)

        def __getitem__(self, i):
            return anns[i].file_name, captions[i]

    def tokenize(texts):
        return np.asarray([vocab.encode_caption(t, args.max_len) for t in texts],
                          dtype=np.int32)

    loader = ImageTextLoader(
        DS(), tokenize, batch_size=args.batch_size,
        load_image=lambda f: default_load_image(os.path.join(args.image_root, f)))

    if args.resnet_checkpoint:
        from construction_clip_tpu.models.clip.convert import load_torch_checkpoint

        enc_params = from_torchvision_state_dict(load_torch_checkpoint(args.resnet_checkpoint))
    else:
        enc_params = init_resnet50(jax.random.key(0))

    params = init_lstm_captioner(
        jax.random.key(567), vocab_size=len(vocab), embed_size=args.embed_size,
        attention_dim=args.attention_dim, decoder_dim=args.decoder_dim)
    tx = optax.adam(args.lr)
    state = TrainState.create(params, tx)
    if args.resume and latest_step(args.resume) is not None:
        state = restore_state(args.resume, state)

    # params passed as jit args, not closed over (remote_compile rejects programs
    # with large inline constants — see infer/precompute.make_embed_classify_fn)
    @jax.jit
    def _encode(enc_params, images_u8):
        x = preprocess_batch(images_u8, 224, mean=IMAGENET_MEAN, std=IMAGENET_STD)
        return resnet50_features(enc_params, x)

    def encode(images_u8):
        return _encode(enc_params, images_u8)

    # DP over all local devices (train/lstm.py); the reference trainer is
    # single-GPU (attention_model/train.py:137-163) — this is the TPU upgrade
    from construction_clip_tpu.core.mesh import (create_mesh, DATA_AXIS,
                                                 MODEL_AXIS, shard_batch,
                                                 replicate)
    from construction_clip_tpu.train.lstm import make_lstm_train_step

    n_dev = max(d for d in range(1, len(jax.devices()) + 1)
                if args.batch_size % d == 0)
    mesh = create_mesh({DATA_AXIS: n_dev, MODEL_AXIS: 1},
                       devices=jax.devices()[:n_dev])
    lstm_step = make_lstm_train_step(tx, mesh, dropout_rate=0.3)
    state = replicate(mesh, state)  # keeps restored opt state/step intact

    def train_step(state, feats, caps, rng):
        batch = shard_batch(mesh, {"features": feats, "tokens": caps})
        state, m = lstm_step(state, batch, rng)
        return state, m["loss"]

    logger = MetricLogger(args.log_dir, "attention_model")
    timer = StepTimer()
    rng = jax.random.key(0)

    from construction_clip_tpu.train.resilience import StepWatchdog, run_resilient

    with StepWatchdog(timeout=600.0) as watchdog:
        def train_epoch(state, epoch):
            nonlocal rng
            for batch in loader:
                rng, sub = jax.random.split(rng)
                feats = encode(batch["images"])
                state, loss = train_step(state, feats, batch["tokens"], sub)
                timer.tick()
                watchdog.tick()
                s = int(state.step)
                if s % 25 == 0:
                    logger.log(s, loss=float(loss), step_time=timer.mean)
                    print(f"epoch {epoch} step {s} loss {float(loss):.4f}")
            return state

        run_resilient(train_epoch, state, epochs=args.epochs,
                      checkpoint_dir=args.output_dir, save_every_epochs=1)
    logger.close()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Show-attend-tell eval/visualization — the `attention_model/test.py` entry point:
regenerate captions and save the 7x7 attention-alpha overlays per generated word
(reference attention_model/test.py:17-72,105-195).
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
    p.add_argument("--checkpoint", required=False, default=None,
                   help="orbax dir from apps/train_attention.py")
    p.add_argument("--resnet_checkpoint", default=None)
    p.add_argument("--embed_size", type=int, default=300)
    p.add_argument("--attention_dim", type=int, default=256)
    p.add_argument("--decoder_dim", type=int, default=512)
    p.add_argument("--freq_threshold", type=int, default=5)
    p.add_argument("--max_len", type=int, default=20)
    p.add_argument("--limit", type=int, default=5)
    p.add_argument("--output_dir", default="output/attention_model")
    args = p.parse_args()

    enable_compilation_cache()
    import jax

    from construction_clip_tpu.data.pipeline import default_load_image, host_shape_unify
    from construction_clip_tpu.data.preprocess import (
        preprocess_batch, IMAGENET_MEAN, IMAGENET_STD)
    from construction_clip_tpu.data.schema import load_annotations
    from construction_clip_tpu.data.vocabulary import Vocabulary
    from construction_clip_tpu.models.resnet import (
        resnet50_features, init_resnet50, from_torchvision_state_dict)
    from construction_clip_tpu.models.lstm_captioner import (
        init_lstm_captioner, generate_caption)
    from construction_clip_tpu.train.state import TrainState
    from construction_clip_tpu.train.checkpoint import restore_state

    anns = [a for a in load_annotations(args.json_path)
            if (a.caption or a.violation_list)]
    vocab = Vocabulary(args.freq_threshold)
    vocab.build_vocabulary([a.caption or a.violation_list for a in anns])

    if args.resnet_checkpoint:
        from construction_clip_tpu.models.clip.convert import load_torch_checkpoint

        enc_params = from_torchvision_state_dict(load_torch_checkpoint(args.resnet_checkpoint))
    else:
        enc_params = init_resnet50(jax.random.key(0))
    params = init_lstm_captioner(
        jax.random.key(567), vocab_size=len(vocab), embed_size=args.embed_size,
        attention_dim=args.attention_dim, decoder_dim=args.decoder_dim)
    if args.checkpoint:
        import optax

        state = TrainState.create(params, optax.adam(1e-3))
        params = restore_state(args.checkpoint, state).params

    os.makedirs(args.output_dir, exist_ok=True)
    done = 0
    for a in anns:
        if done >= args.limit:
            break
        try:
            img = default_load_image(os.path.join(args.image_root, a.file_name))
        except (FileNotFoundError, OSError) as e:
            print(f"skip {a.file_name}: {e}")
            continue
        u8 = host_shape_unify(img, 256)
        x = preprocess_batch(u8[None], 224, mean=IMAGENET_MEAN, std=IMAGENET_STD)
        feats = resnet50_features(enc_params, x)
        toks, lengths, alphas = generate_caption(
            params, feats, sos_id=vocab.stoi["<SOS>"], eos_id=vocab.stoi["<EOS>"],
            max_len=args.max_len)
        words = [vocab.itos.get(int(t), "<UNK>")
                 for t in np.asarray(toks[0][: int(lengths[0])])]
        print(f"{a.file_name}: {' '.join(words)}")
        _save_overlays(u8, words, np.asarray(alphas[0]),
                       os.path.join(args.output_dir,
                                    os.path.basename(a.file_name) + ".attn.png"))
        done += 1


def _save_overlays(image_u8, words, alphas, out_path, grid=7):
    """Per-word alpha overlays in one figure (reference test.py:43-72)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import jax
    import jax.numpy as jnp

    n = max(len(words), 1)
    cols = min(n, 5)
    rows = -(-n // cols)
    fig, axes = plt.subplots(rows, cols, figsize=(3 * cols, 3 * rows), squeeze=False)
    for i in range(rows * cols):
        ax = axes[i // cols][i % cols]
        ax.axis("off")
        if i >= len(words):
            continue
        side = int(round(alphas.shape[-1] ** 0.5))
        a7 = alphas[i][: side * side].reshape(side, side)
        heat = jax.image.resize(jnp.asarray(a7),
                                (image_u8.shape[0], image_u8.shape[1]), "bilinear")
        ax.imshow(image_u8)
        ax.imshow(np.asarray(heat), alpha=0.6, cmap="jet")
        ax.set_title(words[i])
    fig.tight_layout()
    fig.savefig(out_path, dpi=90)
    plt.close(fig)


if __name__ == "__main__":
    main()

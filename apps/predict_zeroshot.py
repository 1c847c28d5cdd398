#!/usr/bin/env python
"""Zero-shot classification + similarity-matrix plot — the `CLIP/predict.py` entry
point (reference CLIP/predict.py:12-75): batched zero-shot over label prompts, argmax
label per image, matplotlib similarity grid.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from common import enable_compilation_cache, load_clip, load_clip_tokenizer


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--json_path", default="../test.json")
    p.add_argument("--image_root", default="../")
    p.add_argument("--key", default="violation_type",
                   choices=["violation_type", "caption_type"])
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--arch", default="vit_b_32",
                   choices=["vit_b_32", "vit_b_16", "vit_l_14", "tiny", "tiny_bpe"])
    p.add_argument("--clip_bpe", default=None)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--plot", default=None, help="write similarity-matrix figure here")
    p.add_argument("--out", default=None, help="write predictions JSON here")
    args = p.parse_args()

    enable_compilation_cache()
    import jax.numpy as jnp

    from construction_clip_tpu.data.labels import (
        VIOLATION_TYPES, CAPTION_TYPE_PROMPTS, CAPTION_TYPES)
    from construction_clip_tpu.data.preprocess import preprocess_batch
    from construction_clip_tpu.data.schema import load_annotations
    from construction_clip_tpu.infer.zeroshot import label_features, classify_batch

    params, cfg = load_clip(args.checkpoint, arch=args.arch)
    tokenizer = load_clip_tokenizer(args.clip_bpe, expect_vocab=cfg.text.vocab_size if args.checkpoint else None)
    if args.key == "violation_type":
        prompts, names = list(VIOLATION_TYPES), list(VIOLATION_TYPES)
    else:
        prompts, names = list(CAPTION_TYPE_PROMPTS), list(CAPTION_TYPES)

    feats = label_features(params, cfg,
                           jnp.asarray(tokenizer.tokenize(prompts, cfg.text.context_length)))

    from common import stream_corpus

    annotations = load_annotations(args.json_path)
    results, correct, total = [], 0, 0
    all_probs = []

    def process(batch_anns, staged):
        nonlocal correct, total
        imgs = preprocess_batch(staged, cfg.vision.image_size)
        probs, pred = classify_batch(params, cfg, imgs, feats)
        for a, pr, pd in zip(batch_anns, np.asarray(probs), np.asarray(pred)):
            label = names[int(pd)]
            gt = getattr(a, args.key)
            results.append({"id": a.id, "file_name": a.file_name,
                            "prediction": label, "ground_truth": gt,
                            "probs": pr.round(4).tolist()})
            all_probs.append(pr)
            if gt:
                total += 1
                correct += int(label == gt)

    for batch_anns, staged in stream_corpus(annotations, args.image_root,
                                            args.batch_size):
        process(batch_anns, staged)

    if total:
        print(f"accuracy: {correct}/{total} = {correct/total:.3f}")
    if args.out:
        with open(args.out, "w", encoding="utf-8") as f:
            json.dump(results, f, ensure_ascii=False, indent=2)
        print(f"wrote {args.out}")
    if args.plot and all_probs:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        mat = np.stack(all_probs)
        fig, ax = plt.subplots(figsize=(max(6, len(names)), max(4, len(mat) / 4)))
        ax.imshow(mat, vmin=0, vmax=1, cmap="viridis")
        ax.set_xticks(range(len(names)))
        ax.set_xticklabels(names, rotation=45)
        ax.set_ylabel("image")
        fig.colorbar(ax.images[0])
        fig.tight_layout()
        fig.savefig(args.plot, dpi=120)
        print(f"wrote {args.plot}")


if __name__ == "__main__":
    main()

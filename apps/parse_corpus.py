#!/usr/bin/env python
"""CLIP-embedding precompute + attribute pseudo-labeling — the
`CLIP_prefix_caption/parse_coco.py` entry point (reference parse_coco.py:15-76).

Streams the corpus through one jitted batched forward (embedding + both zero-shot
classifications per batch) and writes a portable .npz archive for apps/train_clipcap.py.
"""

from __future__ import annotations

import argparse

from common import enable_compilation_cache, load_clip, load_clip_tokenizer


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--clip_model_type", default="ViT-B/32",
                   choices=["ViT-B/32", "ViT-B/16", "ViT-L/14"])
    p.add_argument("--json_path", default="../all.json")
    p.add_argument("--image_root", default="../")
    p.add_argument("--checkpoint", default=None,
                   help="fine-tuned CLIP weights (.pt or .npz); reference uses "
                        "../CLIP/models/clip_latest.pt")
    p.add_argument("--clip_bpe", default=None)
    p.add_argument("--out", default="./embedding/ViT-B_32_train_embedding.npz")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--arch", default=None,
                   help="override the clip_model_type arch mapping (e.g. tiny_bpe "
                        "for test-scale runs)")
    args = p.parse_args()

    enable_compilation_cache()
    arch_map = {"ViT-B/32": "vit_b_32", "ViT-B/16": "vit_b_16", "ViT-L/14": "vit_l_14"}
    params, cfg = load_clip(args.checkpoint, arch=args.arch or arch_map[args.clip_model_type])
    tokenizer = load_clip_tokenizer(args.clip_bpe, expect_vocab=cfg.text.vocab_size if args.checkpoint else None)

    import os

    from construction_clip_tpu.data.schema import load_annotations
    from construction_clip_tpu.infer.precompute import precompute_corpus

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    annotations = load_annotations(args.json_path)
    out = precompute_corpus(params, cfg, annotations, tokenizer,
                            image_root=args.image_root, batch_size=args.batch_size,
                            out_path=args.out)
    print(f"wrote {args.out}: {len(out['embeddings'])} embeddings")


if __name__ == "__main__":
    main()

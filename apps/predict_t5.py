#!/usr/bin/env python
"""ClipCap mT5 caption inference — the `CLIP_prefix_caption/test_t5.py` entry point:
image -> CLIP embed -> mapper prefix ‖ encoder states -> sampled T5 decode
(reference test_t5.py:245-249,457-487).
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from common import (enable_compilation_cache, fit_t5_vocab, load_clip,
                    load_clip_tokenizer, load_hf_tokenizer)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--json_path", default="../test.json")
    p.add_argument("--image_root", default="../")
    p.add_argument("--clip_checkpoint", default=None)
    p.add_argument("--arch", default="vit_b_32",
                   choices=["vit_b_32", "vit_b_16", "vit_l_14", "tiny", "tiny_bpe"])
    p.add_argument("--clip_bpe", default=None)
    p.add_argument("--caption_checkpoint", default=None, help="npz {mapper,t5}")
    p.add_argument("--tokenizer", default="chinese_bpe.json")
    p.add_argument("--prefix_length", type=int, default=20)
    p.add_argument("--mapping_type", default="mlp")
    p.add_argument("--t5_size", default="small", choices=["small", "tiny"])
    p.add_argument("--max_length", type=int, default=32)
    p.add_argument("--greedy", action="store_true")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--out", default="output/output_t5.json")
    args = p.parse_args()

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from construction_clip_tpu.core.configs import ClipCapConfig, T5Config
    from construction_clip_tpu.data.preprocess import preprocess_batch
    from construction_clip_tpu.data.schema import load_annotations
    from construction_clip_tpu.infer.decode_t5 import t5_generate
    from construction_clip_tpu.infer.precompute import make_embed_classify_fn
    from construction_clip_tpu.data.labels import (
        CAPTION_TYPE_PROMPTS, VIOLATION_TYPES, attribute_string)
    from construction_clip_tpu.models.clipcap.t5_model import (
        init_clipcap_t5, encode_with_prefix)
    from construction_clip_tpu.train.checkpoint import load_params_npz

    clip_params, clip_cfg = load_clip(args.clip_checkpoint, arch=args.arch)
    clip_tok = load_clip_tokenizer(args.clip_bpe, expect_vocab=clip_cfg.text.vocab_size if args.clip_checkpoint else None)
    lm_tok = load_hf_tokenizer(args.tokenizer)
    tcfg = T5Config() if args.t5_size == "small" else T5Config.tiny()
    tcfg = fit_t5_vocab(tcfg, lm_tok)
    ccfg = ClipCapConfig(prefix_length=args.prefix_length, attribute_length=0,
                         clip_dim=clip_cfg.text.embed_dim, mapper=args.mapping_type)
    params = init_clipcap_t5(jax.random.key(0), ccfg, tcfg)
    if args.caption_checkpoint:
        params = load_params_npz(args.caption_checkpoint, params)

    ctx = clip_cfg.text.context_length
    embed_classify = make_embed_classify_fn(
        clip_params, clip_cfg, clip_tok.tokenize(list(CAPTION_TYPE_PROMPTS), ctx),
        clip_tok.tokenize(list(VIOLATION_TYPES), ctx))

    from common import stream_corpus

    annotations = load_annotations(args.json_path)
    results = []

    def process(batch_anns, staged):
        x = preprocess_batch(staged, clip_cfg.vision.image_size)
        emb, ct, vt = embed_classify(x)
        attrs = [attribute_string(CAPTION_TYPE_PROMPTS[int(c)], VIOLATION_TYPES[int(v)])
                 for c, v in zip(np.asarray(ct), np.asarray(vt))]
        ids = np.zeros((len(attrs), 8), np.int32)
        for i, a in enumerate(attrs):
            e = lm_tok.encode(a)[:8]
            ids[i, : len(e)] = e
        hidden, mask = encode_with_prefix(
            params, ccfg, tcfg, input_ids=jnp.asarray(ids),
            attention_mask=jnp.asarray((ids != 0).astype(np.int32)), clip_embed=emb)
        res = t5_generate(params["t5"], tcfg, hidden, key=jax.random.key(567),
                          encoder_mask=mask, max_steps=args.max_length,
                          do_sample=not args.greedy)
        for ann, attr, row, n in zip(batch_anns, attrs, np.asarray(res.tokens),
                                     np.asarray(res.lengths)):
            cap = lm_tok.decode([int(t) for t in row[: int(n)] if int(t) > 1],
                                skip_special_tokens=True).replace(" ", "")
            results.append({"id": ann.id, "file_name": ann.file_name,
                            "attribute": attr, "caption": cap,
                            "ground_truth_caption": ann.caption or ann.violation_list})
            print(f"{ann.file_name}: {attr}{cap}")

    for batch_anns, staged in stream_corpus(annotations, args.image_root,
                                            args.batch_size):
        process(batch_anns, staged)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w", encoding="utf-8") as f:
        json.dump(results, f, ensure_ascii=False, indent=2)
    print(f"wrote {args.out} ({len(results)} items)")


if __name__ == "__main__":
    main()

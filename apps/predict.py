#!/usr/bin/env python
"""Batch evaluation pipeline (classify -> caption -> plot) — the root `predict.py`
entry point (reference predict.py:42-88), batched.

Loads a fine-tuned CLIP + ClipCap checkpoint, streams test.json through batched
classification + captioning, writes predictions JSON and optional annotated figures.
(Explainability overlays — reference attention.py — via --explain once per-image;
see construction_clip_tpu/infer/explain.py.)
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

from common import (enable_compilation_cache, load_clip, load_clip_tokenizer,
                    load_hf_tokenizer)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--json_path", default="test.json")
    p.add_argument("--image_root", default=".")
    p.add_argument("--clip_checkpoint", default=None)
    p.add_argument("--arch", default="vit_b_32",
                   choices=["vit_b_32", "vit_b_16", "vit_l_14", "tiny", "tiny_bpe"])
    p.add_argument("--caption_checkpoint", default=None,
                   help="npz of clipcap params {mapper,gpt} (train_clipcap output)")
    p.add_argument("--clip_bpe", default=None)
    p.add_argument("--tokenizer", default="ckiplab/gpt2-base-chinese")
    p.add_argument("--prefix_length", type=int, default=20)
    p.add_argument("--attribute_length", type=int, default=20)
    p.add_argument("--mapping_type", default="mlp")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--policy", default="auto",
                   choices=["auto", "fp32", "bf16"],
                   help="compute precision; auto = bf16 on TPU, fp32 on CPU "
                        "(fp32 beam decode at B=16 hits a TPU-backend fault; "
                        "see core/precision.py)")
    p.add_argument("--beam", action="store_true", default=True)
    p.add_argument("--greedy", dest="beam", action="store_false")
    p.add_argument("--output_dir", default="output")
    p.add_argument("--suspect_retries", type=int, default=2,
                   help="re-run rows still decode_suspect after the "
                        "pipeline's in-process greedy retry (corrupted-TPU-"
                        "worker garbage window) this many times")
    p.add_argument("--suspect_backoff", type=float, default=300.0,
                   help="seconds to wait before each decode_suspect re-run "
                        "(worker garbage windows clear in ~10-15 min)")
    p.add_argument("--plots", action="store_true", help="write annotated figures")
    p.add_argument("--explain", action="store_true", help="relevance overlays")
    p.add_argument("--attention_maps", action="store_true",
                   help="per-token decoder attention heatmaps (reference "
                        "test.py attention_map figure)")
    args = p.parse_args()

    enable_compilation_cache()
    import jax

    from construction_clip_tpu.core.configs import ClipCapConfig, GPT2Config
    from construction_clip_tpu.core.precision import policy_from_name
    from construction_clip_tpu.data.preprocess import preprocess_batch
    from construction_clip_tpu.data.schema import load_annotations
    from construction_clip_tpu.infer.caption import CaptionPipeline
    from construction_clip_tpu.models.clipcap import init_clipcap
    from construction_clip_tpu.train.checkpoint import load_params_npz

    clip_params, clip_cfg = load_clip(args.clip_checkpoint, arch=args.arch)
    gcfg = GPT2Config.tiny() if args.arch.startswith("tiny") else GPT2Config()
    ccfg = ClipCapConfig(prefix_length=args.prefix_length,
                         attribute_length=args.attribute_length,
                         mapper=args.mapping_type,
                         clip_dim=clip_cfg.text.embed_dim)
    cap_params = init_clipcap(jax.random.key(0), ccfg, gcfg)
    if args.caption_checkpoint:
        cap_params = load_params_npz(args.caption_checkpoint, cap_params)

    pipe = CaptionPipeline(
        clip_params=clip_params, clip_cfg=clip_cfg, cap_params=cap_params,
        ccfg=ccfg, gcfg=gcfg,
        clip_tokenizer=load_clip_tokenizer(
            args.clip_bpe,
            expect_vocab=clip_cfg.text.vocab_size if args.clip_checkpoint else None),
        lm_tokenizer=load_hf_tokenizer(args.tokenizer),
        policy=policy_from_name(args.policy))

    from common import stream_corpus

    os.makedirs(args.output_dir, exist_ok=True)
    annotations = load_annotations(args.json_path)
    results = []
    for batch_anns, staged in stream_corpus(annotations, args.image_root,
                                            args.batch_size):
        imgs = preprocess_batch(staged, clip_cfg.vision.image_size)
        preds = pipe.caption_images(imgs, use_beam=args.beam)
        for i, (a, pr) in enumerate(zip(batch_anns, preds)):
            rec = {"id": a.id, "file_name": a.file_name,
                   "ground_truth_caption": a.caption or a.violation_list,
                   "ground_truth_attribute": f"{a.caption_type} {a.violation_type} ",
                   **pr}
            results.append(rec)
            print(f"{a.file_name}: {pr['attribute']}{pr['caption']}")
            if args.plots:
                _plot(os.path.join(args.image_root, a.file_name), rec,
                      os.path.join(args.output_dir,
                                   os.path.basename(a.file_name) + ".png"))
            if args.explain:
                _explain(pipe, clip_params, clip_cfg, imgs[i], staged[i],
                         pr["caption"] or pr["attribute"],
                         os.path.join(args.output_dir,
                                      os.path.basename(a.file_name) + ".relevance.png"))
            if args.attention_maps:
                _attention_map(pipe, imgs[i], pr,
                               os.path.join(args.output_dir,
                                            os.path.basename(a.file_name) + ".attn.png"))

    # Garbage-window recovery (round 4): rows the pipeline flagged
    # decode_suspect (still collapsed after its in-process greedy retry —
    # a corrupted-TPU-worker window returns token-0 logits for SOME rows of
    # a decode program, nondeterministically; tools/diag_beam_variants.py)
    # are re-run after a backoff, while the worker recovers. Plots/explain
    # artifacts are not regenerated for retried rows.
    by_id = {a.id: a for a in annotations}
    for attempt in range(args.suspect_retries):
        sus = [r for r in results if r.get("decode_suspect")]
        if not sus:
            break
        print(f"decode_suspect rows: {len(sus)}/{len(results)} — "
              f"retry {attempt + 1}/{args.suspect_retries} after "
              f"{args.suspect_backoff:.0f}s backoff", flush=True)
        time.sleep(args.suspect_backoff)
        rec_by_id = {r["id"]: r for r in sus}
        sus_anns = [by_id[r["id"]] for r in sus]
        for batch_anns, staged in stream_corpus(sus_anns, args.image_root,
                                                args.batch_size):
            imgs = preprocess_batch(staged, clip_cfg.vision.image_size)
            preds = pipe.caption_images(imgs, use_beam=args.beam)
            for a, pr in zip(batch_anns, preds):
                rec_by_id[a.id].update(pr)
    n_sus = sum(1 for r in results if r.get("decode_suspect"))
    if n_sus:
        print(f"WARNING: {n_sus}/{len(results)} rows remain decode_suspect "
              f"after {args.suspect_retries} retries", flush=True)

    out_json = os.path.join(args.output_dir, "output_log.json")
    with open(out_json, "w", encoding="utf-8") as f:
        json.dump(results, f, ensure_ascii=False, indent=2)
    print(f"wrote {out_json} ({len(results)} items)")


def _explain(pipe, clip_params, clip_cfg, preprocessed_img, raw_u8, text, out_path):
    """Relevance products for (image, generated caption): the JET image overlay
    (reference attention.py:75-99) AND the per-token text heatmap HTML
    (reference attention.py:113-143 show_heatmap_on_text -> test.html)."""
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from construction_clip_tpu.infer.explain import (
        interpret, image_relevance_map, overlay_heatmap,
        text_heatmap_per_char, render_text_heatmap_html)

    tokens = pipe.clip_tokenizer.tokenize([text], clip_cfg.text.context_length)
    R_text, R_image = interpret(clip_params, clip_cfg, preprocessed_img[None],
                                jnp.asarray(tokens))
    heat = image_relevance_map(np.asarray(R_image)[0, 0], clip_cfg.vision.grid,
                               out_size=raw_u8.shape[0])
    heat = np.asarray(Image.fromarray((heat * 255).astype(np.uint8))
                      .resize((raw_u8.shape[1], raw_u8.shape[0]))) / 255.0
    Image.fromarray(overlay_heatmap(raw_u8, heat)).save(out_path)
    char_scores = text_heatmap_per_char(np.asarray(R_text)[0], tokens[0], text,
                                        pipe.clip_tokenizer)
    render_text_heatmap_html(char_scores, out_path.rsplit(".", 1)[0] + ".html",
                             title=text)


def _attention_map(pipe, preprocessed_img, pred, out_path):
    """Decoder attention heatmap for the generated caption (reference
    test.py:342-350 attention_map)."""
    import jax.numpy as jnp
    import numpy as np

    from construction_clip_tpu.infer.explain import (
        decoder_attention_map, plot_attention_map)

    ids = pipe.lm_tokenizer.encode(pred["caption"] or pred["attribute"])
    if not ids:
        return
    emb, _ = pipe.classify_and_embed(preprocessed_img[None])
    prompt = pipe.prompt_embeds(emb, pipe.attribute_tokens([pred["attribute"]]))
    rows = decoder_attention_map(pipe.cap_params["gpt"], pipe.gcfg, prompt,
                                 jnp.asarray(np.asarray(ids, np.int32)[None]))
    labels = [pipe.lm_tokenizer.decode([t]) for t in ids]
    plot_attention_map(rows, out_path, token_labels=labels)


def _plot(image_path, rec, out_path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from PIL import Image

    fig, ax = plt.subplots()
    ax.imshow(Image.open(image_path))
    ax.axis("off")
    ax.set_title(f"pred: {rec['attribute']}{rec['caption']}\n"
                 f"gt: {rec['ground_truth_attribute']}{rec['ground_truth_caption']}")
    fig.savefig(out_path, dpi=100, bbox_inches="tight")
    plt.close(fig)


if __name__ == "__main__":
    main()

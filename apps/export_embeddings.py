#!/usr/bin/env python
"""GPT-2 word-embedding PCA export — the `CLIP_prefix_caption/export_prediction.py`
entry point (reference export_prediction.py:500-530): take the most frequent caption
tokens, project their LM embedding rows to 1-D with PCA, write "word value" lines.
"""

from __future__ import annotations

import argparse
import collections

import numpy as np

from common import enable_compilation_cache, load_hf_tokenizer


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--json_path", default="../fengyu/0_all.json")
    p.add_argument("--tokenizer", default="ckiplab/gpt2-base-chinese")
    p.add_argument("--gpt_checkpoint", default=None)
    p.add_argument("--top_k", type=int, default=100)
    p.add_argument("--tiny", action="store_true",
                   help="tiny GPT-2 config (tests: skips the 102M random init)")
    p.add_argument("--out", default="gpt2_embeddings.txt")
    args = p.parse_args()

    enable_compilation_cache()
    import jax

    from construction_clip_tpu.core.configs import GPT2Config
    from construction_clip_tpu.data.schema import load_annotations
    from construction_clip_tpu.models import gpt2 as gpt2_lib

    tokenizer = load_hf_tokenizer(args.tokenizer)
    gcfg = GPT2Config.tiny() if args.tiny else GPT2Config()
    if args.gpt_checkpoint:
        from construction_clip_tpu.models.clip.convert import load_torch_checkpoint

        params = gpt2_lib.from_hf_state_dict(load_torch_checkpoint(args.gpt_checkpoint), gcfg)
    else:
        params = gpt2_lib.init_gpt2(jax.random.key(0), gcfg)

    from construction_clip_tpu.data.corpus import tokenize_zh

    # word counts over segmented caption tokens (reference
    # export_prediction.py:512-518: Counter over tokenize(caption), top 100)
    freq: collections.Counter = collections.Counter()
    for a in load_annotations(args.json_path):
        text = a.caption or a.violation_list
        if text:
            freq.update(tokenize_zh(text))
    words = freq.most_common(args.top_k)
    if not words:
        print("no tokens found")
        return

    wte = np.asarray(params["wte"])  # [vocab, n_embd]
    written = 0
    with open(args.out, "w", encoding="utf-8") as f:
        for word, _ in words:
            # reference export_prediction.py:521-528: per WORD, take its token
            # rows [n_tok, n_embd], PCA(1) over n_embd samples of n_tok features
            # (fit_transform of the TRANSPOSED matrix), and write the n_embd
            # principal-component scores — one line "word v1 ... v{n_embd}".
            try:
                ids = tokenizer.encode(word, add_special_tokens=False)
            except TypeError:
                ids = tokenizer.encode(word)
            ids = [t for t in ids if 0 <= t < wte.shape[0]]
            if not ids:
                continue
            vec_t = wte[ids].T                      # [n_embd, n_tok] (samples, feats)
            centered = vec_t - vec_t.mean(axis=0)
            _, _, vt = np.linalg.svd(centered, full_matrices=False)
            scores = centered @ vt[0]               # [n_embd]
            if scores[np.argmax(np.abs(scores))] < 0:
                scores = -scores  # sklearn svd_flip: largest-|score| positive
            f.write(word + " " + " ".join(str(float(v)) for v in scores) + "\n")
            written += 1
    print(f"wrote {args.out}: {written} words x {wte.shape[1]} PCA scores")


if __name__ == "__main__":
    main()

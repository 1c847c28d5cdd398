#!/usr/bin/env python
"""Deterministic offline stand-ins for the two tokenizer assets this image
cannot download (zero egress):

  1. A CLIP BPE merges file with exactly 48894 merge rules, so ClipTokenizer
     yields the standard 49408-token vocabulary (matching CLIPConfig.*.text
     .vocab_size — apps/common.load_clip_tokenizer's expect_vocab guard).
     The merges are synthetic left-linear chains over ASCII letters; Chinese
     text tokenizes through the byte-fallback path exactly as the real file
     would for out-of-merge scripts. NOT the OpenAI vocabulary: token IDS
     DIFFER from clip.tokenize, so this asset is for end-to-end pipeline
     runs with from-scratch or fine-tuned-from-random weights, never for
     loading pretrained OpenAI text towers (reference CLIP/train.py:105).

  2. A BERT-style Chinese vocab.txt with exactly 21128 entries (the
     ckiplab/gpt2-base-chinese == bert-base-chinese vocabulary size,
     reference CLIP_prefix_caption/train.py:401), specials at the canonical
     ids ([PAD]=0, [UNK]=100, [CLS]=101, [SEP]=102, [MASK]=103 — the beam
     stop token 102 of reference test.py:426 is preserved), real corpus
     characters as entries, [unusedN] filler to size.

Usage: python tools/make_offline_assets.py --corpus /root/reference/all.json \
       --out_dir assets/
"""

from __future__ import annotations

import argparse
import gzip
import itertools
import json
import os
import string

N_MERGES = 49152 - 256 - 2  # 48894, ClipTokenizer.N_MERGES_OPENAI


def write_clip_merges(path: str, n_merges: int = N_MERGES) -> None:
    """Left-linear merge chains: every ASCII-lowercase string of length 2..4
    (lexicographic) contributes the merge (s[:-1], s[-1]); prefixes are always
    generated before their extensions, and each token string is produced by
    exactly one merge, so the vocabulary stays duplicate-free."""
    letters = string.ascii_lowercase
    merges = []
    for length in (2, 3, 4):
        for tup in itertools.product(letters, repeat=length):
            s = "".join(tup)
            merges.append(f"{s[:-1]} {s[-1]}")
            if len(merges) == n_merges:
                break
        if len(merges) == n_merges:
            break
    assert len(merges) == n_merges
    with gzip.open(path, "wt", encoding="utf-8") as f:
        f.write("#version: synthetic-offline\n")
        f.write("\n".join(merges) + "\n")


def corpus_characters(json_paths) -> list[str]:
    from construction_clip_tpu.data.labels import VIOLATION_TYPES, CAPTION_TYPE_PROMPTS

    chars = set("".join(VIOLATION_TYPES) + "".join(CAPTION_TYPE_PROMPTS))
    for p in json_paths:
        with open(p, encoding="utf-8") as f:
            data = json.load(f)
        for a in data.get("annotations", []):
            for key in ("caption", "violation_list", "caption_type",
                        "violation_type", "objects"):
                v = a.get(key) or ""
                chars.update(v)
    return sorted(c for c in chars if not c.isspace())


def write_bert_vocab(path: str, chars: list[str], size: int = 21128) -> None:
    """size 21128 = ckiplab/gpt2-base-chinese (== bert-base-chinese); a
    smaller size keeps the canonical special positions and packs as many
    corpus characters as fit (GPT2Config.tiny vocab 128 smoke runs)."""
    vocab = ["[PAD]"] + [f"[unused{i}]" for i in range(1, 100)] + \
        ["[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    if size >= 21128:
        vocab += list(string.ascii_lowercase) + list(string.digits)
    vocab += [c for c in chars if c not in set(vocab)][: size - len(vocab)]
    if size >= 21128:
        # wordpiece continuations for latin/digits (CJK chars are split to
        # single tokens by the tokenizer's chinese-chars pass, never need ##)
        vocab += ["##" + c for c in string.ascii_lowercase + string.digits]
    i = 100
    while len(vocab) < size:
        vocab.append(f"[unused{i}]")
        i += 1
    assert len(vocab) == size, len(vocab)
    assert vocab[102] == "[SEP]"
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(vocab) + "\n")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--corpus", nargs="+", default=["/root/reference/all.json"])
    p.add_argument("--out_dir", default="assets")
    p.add_argument("--tiny", action="store_true",
                   help="test-scale assets: 6-merge BPE (vocab 520 == "
                        "CLIPConfig.tiny_bpe) and a 128-token bert vocab "
                        "(== GPT2Config.tiny)")
    args = p.parse_args()

    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    os.makedirs(os.path.join(args.out_dir, "bert_zh_vocab"), exist_ok=True)
    merges = os.path.join(args.out_dir, "clip_bpe_offline.txt.gz")
    write_clip_merges(merges, n_merges=6 if args.tiny else N_MERGES)
    from construction_clip_tpu.data.clip_tokenizer import ClipTokenizer
    tok = ClipTokenizer(merges)
    assert tok.vocab_size == (520 if args.tiny else 49408), tok.vocab_size
    print(f"wrote {merges} (vocab {tok.vocab_size})")

    vocab_txt = os.path.join(args.out_dir, "bert_zh_vocab", "vocab.txt")
    chars = corpus_characters(args.corpus)
    write_bert_vocab(vocab_txt, chars, size=128 if args.tiny else 21128)
    print(f"wrote {vocab_txt} ({len(chars)} corpus chars)")


if __name__ == "__main__":
    main()

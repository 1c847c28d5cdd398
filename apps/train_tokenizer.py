#!/usr/bin/env python
"""BPE tokenizer training — the `CLIP_prefix_caption/train_tokenizer.py` entry point
(reference train_tokenizer.py:6-11): HF `tokenizers` BPE with Whitespace pre-tokenizer
and specials [UNK][CLS][SEP][PAD][MASK], trained on a text dump -> chinese_bpe.json.
"""

from __future__ import annotations

import argparse


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", default="text.txt", nargs="+")
    p.add_argument("--out", default="chinese_bpe.json")
    p.add_argument("--vocab_size", type=int, default=30000)
    p.add_argument("--min_frequency", type=int, default=2)
    args = p.parse_args()

    from tokenizers import Tokenizer
    from tokenizers.models import BPE
    from tokenizers.pre_tokenizers import Whitespace
    from tokenizers.trainers import BpeTrainer

    tok = Tokenizer(BPE(unk_token="[UNK]"))
    tok.pre_tokenizer = Whitespace()
    trainer = BpeTrainer(
        vocab_size=args.vocab_size, min_frequency=args.min_frequency,
        special_tokens=["[UNK]", "[CLS]", "[SEP]", "[PAD]", "[MASK]"])
    files = args.input if isinstance(args.input, list) else [args.input]
    tok.train(files, trainer)
    tok.save(args.out)
    print(f"wrote {args.out} (vocab {tok.get_vocab_size()})")


if __name__ == "__main__":
    main()

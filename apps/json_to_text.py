#!/usr/bin/env python
"""Caption text dump for tokenizer training — the
`CLIP_prefix_caption/json_to_text.py` entry point (reference json_to_text.py:3-17):
concatenate corpus captions into one text file.
"""

from __future__ import annotations

import argparse
import json


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--json_path", default="../fengyu/0_all.json")
    p.add_argument("--out", default="text.txt")
    p.add_argument("--key", default="caption")
    args = p.parse_args()

    with open(args.json_path, encoding="utf-8") as f:
        data = json.load(f)
    n = 0
    with open(args.out, "w", encoding="utf-8") as f:
        for a in data["annotations"]:
            text = a.get(args.key) or a.get("violation_list") or ""
            if text:
                f.write(text + "\n")
                n += 1
    print(f"wrote {args.out}: {n} lines")


if __name__ == "__main__":
    main()

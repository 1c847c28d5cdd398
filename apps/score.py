#!/usr/bin/env python
"""Caption metric scoring — the `CLIP_prefix_caption/score.py` entry point
(reference score.py:8-30): char-level BLEU over an output_log.json, plus the
ROUGE-1/2/L the reference stubbed out.
"""

from __future__ import annotations

import argparse
import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("log_json", help="output_log.json from apps/predict.py")
    p.add_argument("--ref_key", default="ground_truth_caption")
    p.add_argument("--hyp_key", default="caption")
    args = p.parse_args()

    from construction_clip_tpu.infer.score import score_pairs

    with open(args.log_json, encoding="utf-8") as f:
        records = json.load(f)
    pairs = [(r[args.ref_key], r[args.hyp_key]) for r in records
             if r.get(args.ref_key) and r.get(args.hyp_key) is not None]
    out = score_pairs(pairs)
    print(json.dumps(out, ensure_ascii=False, indent=2))


if __name__ == "__main__":
    main()

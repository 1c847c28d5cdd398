#!/usr/bin/env python
"""Training-curve visualization from metric JSONL logs.

The reference's visualize.py is an empty (syntax-broken) stub (reference
visualize.py:6-7); this is the working version: plot any scalar columns from the
MetricLogger JSONL files (train/metrics.py) to a PNG.
"""

from __future__ import annotations

import argparse
import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("jsonl", nargs="+", help="metric JSONL file(s)")
    p.add_argument("--keys", nargs="+", default=["loss"])
    p.add_argument("--out", default="curves.png")
    args = p.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, len(args.keys), figsize=(6 * len(args.keys), 4),
                             squeeze=False)
    for path in args.jsonl:
        records = [json.loads(l) for l in open(path, encoding="utf-8")]
        name = os.path.basename(path).replace(".jsonl", "")
        for i, key in enumerate(args.keys):
            pts = [(r["step"], r[key]) for r in records if key in r]
            if pts:
                xs, ys = zip(*pts)
                axes[0][i].plot(xs, ys, label=name)
    for i, key in enumerate(args.keys):
        axes[0][i].set_xlabel("step")
        axes[0][i].set_title(key)
        axes[0][i].legend()
        axes[0][i].grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Run every benchmark (encode headline, decode, train step, serving) and write a
consolidated JSON — one command for a round's perf snapshot.

Usage: python tools/run_all_benches.py [--out BENCH_SNAPSHOT.json]
Each bench runs as a subprocess (isolated TPU state); stderr streams through.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCHES = [
    ("encode", [sys.executable, os.path.join(REPO, "bench.py")]),
    ("encode_int8", [sys.executable, os.path.join(REPO, "tools/bench_encode_int8.py")]),
    ("decode", [sys.executable, os.path.join(REPO, "tools/bench_decode.py")]),
    ("decode_t5", [sys.executable, os.path.join(REPO, "tools/bench_decode_t5.py")]),
    ("train", [sys.executable, os.path.join(REPO, "tools/bench_train.py")]),
    ("train_caption", [sys.executable, os.path.join(REPO, "tools/bench_train_caption.py")]),
    ("vitl", [sys.executable, os.path.join(REPO, "tools/bench_vitl.py")]),
    ("detection", [sys.executable, os.path.join(REPO, "tools/bench_detection.py")]),
    ("serve", [sys.executable, os.path.join(REPO, "tools/bench_serve.py")]),
    ("serve_detector", [sys.executable, os.path.join(REPO, "tools/bench_serve.py"),
                        "--detector"]),
    # the retained fast config (512 px center crop) alongside the default
    # reference-contract geometry (letterbox 800) above
    ("serve_detector_512crop", [sys.executable,
                                os.path.join(REPO, "tools/bench_serve.py"),
                                "--detector", "--det_size", "512",
                                "--det_geometry", "crop"]),
]


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="BENCH_SNAPSHOT.json")
    p.add_argument("--timeout", type=int, default=3600, help="per bench, seconds")
    p.add_argument("--only", nargs="*", default=None,
                   help="re-run only these benches, merging into the existing "
                        "snapshot (other entries kept)")
    args = p.parse_args()

    results = {}
    if args.only and os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)
    benches = [(n, c) for n, c in BENCHES if not args.only or n in args.only]
    for name, cmd in benches:
        print(f"=== {name} ===", file=sys.stderr, flush=True)
        try:
            r = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO,
                               timeout=args.timeout)
            sys.stderr.write(r.stderr[-2000:])
            line = [l for l in r.stdout.strip().splitlines() if l.startswith("{")]
            results[name] = json.loads(line[-1]) if line else {
                "error": f"exit {r.returncode}"}
        except subprocess.TimeoutExpired:
            results[name] = {"error": "timeout"}
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    # docs quote ONLY these numbers: regenerate the README/BASELINE tables
    import update_docs

    ok = True
    try:
        update_docs.main_with_snapshot(args.out)
    except Exception as e:
        print(f"update_docs failed: {e}", file=sys.stderr)
        ok = False
    print(json.dumps(results))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

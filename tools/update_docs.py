#!/usr/bin/env python
"""Regenerate the performance tables in README.md and BASELINE.md from
BENCH_SNAPSHOT.json — the single source of truth for every number quoted in the
docs. Round-2 review found hand-copied best-run figures drifting ~8% from the
committed snapshot; now `tools/run_all_benches.py` writes the snapshot and calls
this to rewrite everything between the GENERATED:BENCH markers.

Usage: python tools/update_docs.py [--snapshot BENCH_SNAPSHOT.json]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BEGIN = "<!-- GENERATED:BENCH (tools/update_docs.py; do not hand-edit) -->"
END = "<!-- /GENERATED:BENCH -->"


def _fmt_num(v):
    if isinstance(v, float) and v == int(v):
        v = int(v)
    return f"{v:,}" if isinstance(v, (int, float)) else str(v)


def cell(snap, bench, key, unit=""):
    """'**median** [min–max] unit' for one metric, or em-dash if absent."""
    r = snap.get(bench) or {}
    v = r.get(key)
    if v is None:
        return "—"
    mm = r.get(key + "_minmax")
    if key == "value" and mm is None:
        mm = r.get("minmax")
    s = f"**{_fmt_num(v)}**"
    if mm:
        s += f" [{_fmt_num(mm[0])}–{_fmt_num(mm[1])}]"
    if unit:
        s += f" {unit}"
    return s


def render_readme(snap) -> str:
    c = lambda *a, **k: cell(snap, *a, **k)
    serve = snap.get("serve") or {}
    rows = [
        ("CLIP ViT-B/32 image encode (bf16, batch 256)",
         f"{c('encode', 'value', 'img/s')} end-to-end (fused Pallas attention "
         f"block); {c('encode_int8', 'int8_img_s', 'img/s')} int8 serving path "
         f"(cosine ≥{(snap.get('encode_int8') or {}).get('cos_vs_bf16_min', '—')} "
         "vs bf16)",
         "single GPU, unpublished (~400 img/s class)"),
        ("Caption decode (GPT-2 base-zh, 100 steps)",
         f"{c('decode', 'greedy_b1_tok_s', 'tok/s')} @ B=1, "
         f"{c('decode', 'greedy_b32_tok_s', 'tok/s')} @ B=32 greedy; "
         f"{c('decode', 'beam3_b8_tok_s', 'tok/s')} beam-3 @ B=8 (lazy "
         "beam-ancestry cache); mT5-small "
         f"{c('decode_t5', 't5_greedy_b32_tok_s', 'tok/s')} @ B=32"
         + (f" ({c('decode_t5', 't5_greedy_int8head_b32_tok_s', 'tok/s')} int8 head)"
            if "t5_greedy_int8head_b32_tok_s" in (snap.get("decode_t5") or {}) else ""),
         f"no KV cache: {c('decode', 'reference_style_nocache_b1_tok_s', 'tok/s')} "
         "for the reference's recompute-per-token loop on the SAME chip"),
        ("Contrastive train step (fwd+bwd+AdamW, global-batch InfoNCE)",
         f"{c('train', 'train_img_s_b128', 'img/s')} @ b=128 "
         f"({c('train', 'step_ms_b128', 'ms/step')}); "
         f"{c('train', 'train_img_s_b256', 'img/s')} @ b=256",
         "single device, unpublished"),
        ("ViT-L/14 contrastive step (config 5)",
         f"{c('vitl', 'vitl_step_ms_b64', 'ms')} @ b=64 single chip (remat); "
         "TP×DP sharded on virtual meshes", "—"),
        ("Caption train steps (b=64)",
         f"ClipCap {c('train_caption', 'clipcap_full_step_ms_b64', 'ms')} full / "
         f"{c('train_caption', 'clipcap_frozen_step_ms_b64', 'ms')} frozen-LM; "
         f"mT5 {c('train_caption', 't5_full_step_ms_b64', 'ms')}",
         "single device, unpublished"),
        ("Faster R-CNN (512 px, b=8)",
         f"train {c('detection', 'det_step_ms_b8_fast', 'ms/step')} fast loss / "
         f"{c('detection', 'det_step_ms_b8_tv_faithful', 'ms/step')} "
         "torchvision-faithful; inference "
         f"{c('detection', 'det_infer_img_s_b8', 'img/s')} fp32"
         + (f" / {c('detection', 'det_infer_bf16_img_s_b8', 'img/s')} bf16"
            if "det_infer_bf16_img_s_b8" in (snap.get("detection") or {}) else "")
         + (f"; at the reference 800 px serving geometry "
            f"{c('detection', 'det_infer_bf16_img_s_b4_s800', 'img/s')} bf16 b=4"
            if "det_infer_bf16_img_s_b4_s800" in (snap.get("detection") or {})
            else ""),
         "torchvision fasterrcnn_resnet50_fpn (train recipe outside the repo)"),
    ]
    lines = ["| metric | this framework (1x v5e chip) | reference |", "|---|---|---|"]
    lines += [f"| {a} | {b} | {r} |" for a, b, r in rows]
    lines += [
        "",
        "Each number is the MEDIAN over ≥5 timed windows; [min–max] is the",
        "measured spread across windows (run-to-run drift through the TPU tunnel",
        "is real; see BASELINE.md). `tools/run_all_benches.py` regenerates",
        "`BENCH_SNAPSHOT.json` and this table.",
        "",
        "Serving (apps/serve.py, full ViT-B/32 + GPT-2-base on the chip): "
        f"{c('serve', 'single_request_ms', 'ms')} warm single-request latency "
        "(classify + 100-step greedy caption), "
        f"{c('serve', 'concurrent_req_s_24way', 'req/s')} under 24-way concurrency "
        f"(p50 {_fmt_num(serve.get('p50_ms', '—'))} ms, "
        f"p99 {_fmt_num(serve.get('p99_ms', '—'))} ms)"
        + (f"; int8 towers {c('serve', 'int8_concurrent_req_s_24way', 'req/s')} "
           f"(p99 {_fmt_num(serve.get('int8_p99_ms', '—'))} ms, caption parity "
           f"cosine {_fmt_num(serve.get('int8_caption_cos', '—'))})"
           if "int8_concurrent_req_s_24way" in serve else "")
        + ".",
    ]
    det = snap.get("serve_detector") or {}
    if det:
        lines += [
            "",
            "Serving the FULL reference contract (Faster R-CNN detect + 2× "
            "zero-shot classify + caption on EVERY request, the reference's "
            "actual `POST /predict` work): "
            f"{c('serve_detector', 'concurrent_req_s_24way', 'req/s')} under "
            f"24-way concurrency (p50 {_fmt_num(det.get('p50_ms', '—'))} ms, "
            f"p99 {_fmt_num(det.get('p99_ms', '—'))} ms, single-request "
            f"{_fmt_num(det.get('single_request_ms', '—'))} ms) at the "
            f"reference detector geometry "
            f"({_fmt_num(det.get('det_geometry', 'letterbox'))} "
            f"{_fmt_num(det.get('det_size', 800))} px, no content loss) — "
            "`tools/bench_serve.py --detector`; the paragraph above is the "
            "lighter classify+caption contract."
            + (f" Fast detector config (512 px center crop, documented "
               f"band-blind divergence, PARITY.md): "
               f"{c('serve_detector_512crop', 'concurrent_req_s_24way', 'req/s')}"
               f" (p99 {_fmt_num((snap.get('serve_detector_512crop') or {}).get('p99_ms', '—'))} ms)."
               if "serve_detector_512crop" in snap else ""),
        ]
    return "\n".join(lines)


def render_baseline(snap) -> str:
    c = lambda *a, **k: cell(snap, *a, **k)
    rows = [
        ("CLIP encode images/sec/chip (ViT-B/32, bf16, batch 256)",
         f"{c('encode', 'value', 'img/s')}; int8 {c('encode_int8', 'int8_img_s', 'img/s')}",
         "≥5× reference GPU (~2,000 at the 400 img/s proxy)", "`bench.py`"),
        ("Caption decode tokens/sec (GPT-2 base-zh, 100 steps)",
         f"greedy {c('decode', 'greedy_b1_tok_s')} @ B=1 / "
         f"{c('decode', 'greedy_b32_tok_s')} @ B=32; beam-3 "
         f"{c('decode', 'beam3_b8_tok_s')} @ B=8; int8 "
         f"{c('decode', 'greedy_int8_b32_tok_s')} @ B=32; reference-style "
         f"no-cache {c('decode', 'reference_style_nocache_b1_tok_s')}",
         "beat the O(n²) loop", "`tools/bench_decode.py`"),
        ("mT5-small caption decode (config 4, max_length 32)",
         f"{c('decode_t5', 't5_greedy_b1_tok_s')} @ B=1, "
         f"{c('decode_t5', 't5_greedy_b32_tok_s')} @ B=32; int8 head "
         f"{c('decode_t5', 't5_greedy_int8head_b1_tok_s')} @ B=1 / "
         f"{c('decode_t5', 't5_greedy_int8head_b32_tok_s')} @ B=32",
         "measure", "`tools/bench_decode_t5.py`"),
        ("Contrastive step time (fwd+bwd+AdamW, symmetric InfoNCE)",
         f"{c('train', 'step_ms_b128', 'ms')} @ b=128 "
         f"({c('train', 'train_img_s_b128', 'img/s')}); "
         f"{c('train', 'step_ms_b256', 'ms')} @ b=256; "
         f"{c('train', 'step_ms_b256_remat', 'ms')} @ b=256 remat",
         "measure", "`tools/bench_train.py`"),
        ("Caption train steps (configs 3/4, b=64)",
         f"ClipCap full {c('train_caption', 'clipcap_full_step_ms_b64', 'ms')} "
         f"({c('train_caption', 'clipcap_full_seq_s_b64', 'seq/s')}), frozen-LM "
         f"{c('train_caption', 'clipcap_frozen_step_ms_b64', 'ms')}, mT5 full "
         f"{c('train_caption', 't5_full_step_ms_b64', 'ms')}",
         "measure", "`tools/bench_train_caption.py`"),
        ("ViT-L/14 contrastive step (config 5, single chip, remat)",
         f"{c('vitl', 'vitl_step_ms_b64', 'ms')} @ b=64 "
         f"({c('vitl', 'vitl_img_s_b64', 'img/s')}); caption scoring "
         f"{c('vitl', 'score_pairs_per_s', 'pairs/s')} host-side",
         "measure", "`tools/bench_vitl.py`"),
        ("Faster R-CNN train + inference (512 px, b=8)",
         f"step {c('detection', 'det_step_ms_b8_fast', 'ms')} fast loss / "
         f"{c('detection', 'det_step_ms_b8_tv_faithful', 'ms')} tv-faithful; "
         f"inference {c('detection', 'det_infer_img_s_b8', 'img/s')} fp32"
         + (f" / {c('detection', 'det_infer_bf16_img_s_b8', 'img/s')} bf16"
            if "det_infer_bf16_img_s_b8" in (snap.get("detection") or {}) else "")
         + (f"; 800 px (reference geometry) "
            f"{c('detection', 'det_infer_bf16_img_s_b4_s800', 'img/s')} bf16 b=4"
            if "det_infer_bf16_img_s_b4_s800" in (snap.get("detection") or {})
            else ""),
         "measure", "`tools/bench_detection.py`"),
        ("Serving (classify→caption, in-process, greedy)",
         f"{c('serve', 'concurrent_req_s_24way', 'req/s')} @ 24-way (p50 "
         f"{c('serve', 'p50_ms', 'ms')}, p99 {c('serve', 'p99_ms', 'ms')}, "
         f"single-request {c('serve', 'single_request_ms', 'ms')})"
         + (f"; int8 {c('serve', 'int8_concurrent_req_s_24way', 'req/s')} (p99 "
            f"{c('serve', 'int8_p99_ms', 'ms')})"
            if "int8_concurrent_req_s_24way" in (snap.get("serve") or {}) else ""),
         "≥20 req/s", "`tools/bench_serve.py`"),
    ]
    if "serve_detector" in snap:
        sd = snap["serve_detector"]
        rows.append((
            "Serving FULL reference contract (detect+classify+caption/req, "
            f"{sd.get('det_geometry', 'letterbox')} {sd.get('det_size', 800)} px)",
            f"{c('serve_detector', 'concurrent_req_s_24way', 'req/s')} @ 24-way "
            f"(p50 {c('serve_detector', 'p50_ms', 'ms')}, p99 "
            f"{c('serve_detector', 'p99_ms', 'ms')}, single-request "
            f"{c('serve_detector', 'single_request_ms', 'ms')})",
            "measure", "`tools/bench_serve.py --detector`"))
    if "serve_detector_512crop" in snap:
        rows.append((
            "Full contract, fast detector config (512 px center crop — "
            "band-blind, PARITY.md)",
            f"{c('serve_detector_512crop', 'concurrent_req_s_24way', 'req/s')} "
            f"@ 24-way (p99 {c('serve_detector_512crop', 'p99_ms', 'ms')})",
            "measure",
            "`tools/bench_serve.py --detector --det_size 512 --det_geometry crop`"))
    lines = ["| Metric | Measured (median [min–max] over ≥5 windows) | Target | Source |",
             "|---|---|---|---|"]
    lines += [f"| {m} | {v} | {t} | {s} |" for m, v, t, s in rows]
    return "\n".join(lines)


def splice(path: str, generated: str) -> bool:
    with open(path) as f:
        text = f.read()
    pat = re.compile(re.escape(BEGIN) + r".*?" + re.escape(END), re.S)
    if not pat.search(text):
        print(f"{path}: no GENERATED:BENCH markers — skipped", file=sys.stderr)
        return False
    new = pat.sub(BEGIN + "\n" + generated + "\n" + END, text)
    with open(path, "w") as f:
        f.write(new)
    return True


def main_with_snapshot(snapshot_path: str):
    with open(snapshot_path) as f:
        snap = json.load(f)
    ok1 = splice(os.path.join(REPO, "README.md"), render_readme(snap))
    ok2 = splice(os.path.join(REPO, "BASELINE.md"), render_baseline(snap))
    print(f"README.md: {'updated' if ok1 else 'skipped'}; "
          f"BASELINE.md: {'updated' if ok2 else 'skipped'}")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--snapshot", default=os.path.join(REPO, "BENCH_SNAPSHOT.json"))
    args = p.parse_args()
    main_with_snapshot(args.snapshot)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Chained product run: the reference's real workflow driven through this
framework's actual CLIs, each stage consuming the previous stage's artifact
with no hand edits (reference pipeline: CLIP/train.py:101 -> parse_coco.py:15
-> CLIP_prefix_caption/train.py:326 -> test.py:556 -> score.py:8).

  stage 1  apps/train_clip.py       contrastive fine-tune, loss curve recorded
  stage 2  apps/parse_corpus.py     embeddings + zero-shot pseudo-label attributes
                                    from the just-tuned CLIP (train split)
  stage 3  apps/train_clipcap.py    ClipCap caption training to convergence
  stage 4  apps/predict.py          beam-3 captions for the held-out split
  stage 5  apps/score.py            char-BLEU + ROUGE vs the real captions
  stage 6  apps/visualize.py        loss curves PNG

With --t5 (default), the reference's SECOND decoder family is chained through
its own workflow (json_to_text.py -> train_tokenizer.py -> train_t5.py ->
test_t5.py -> score.py, reference CLIP_prefix_caption/{train_t5.py:409,
test_t5.py:457}):

  stage 7  apps/json_to_text.py     caption text dump from the train split
  stage 8  apps/train_tokenizer.py  BPE tokenizer trained on that dump
  stage 9  apps/train_clipcap_t5.py mT5 caption training on stage-2 embeddings
  stage 10 apps/predict_t5.py       greedy mT5 captions for the held-out split
  stage 11 apps/score.py            char-BLEU + ROUGE for the mT5 captions

Corpus: the real 806-annotation all.json (real Chinese captions/labels). The
reference repo ships ZERO images, so pixels are synthesized deterministically
per annotation with class-structured patterns (violation_type sets the stripe
pattern + hue, caption_type the marker shape) — contrastive training has real
signal to learn and the zero-shot pseudo-labels are meaningful.

Tokenizers are the offline stand-ins from tools/make_offline_assets.py (zero
egress: the OpenAI merges / ckiplab vocab cannot be downloaded; ids differ
from the pretrained vocabularies but every pipeline contract is identical).

Writes <workdir>/summary.json + curves.png. Exits nonzero if any stage fails
or the train losses did not decrease.

Real run (TPU):   python tools/run_product_e2e.py --workdir runs/e2e
CPU smoke (tiny): python tools/run_product_e2e.py --workdir /tmp/e2e \
                    --arch tiny_bpe --gpt_size tiny --t5_size tiny --subset 48 \
                    --clip_epochs 2 --cap_epochs 12 --t5_epochs 30 --warmup 4 \
                    --device cpu
                  (--warmup matters: the default 50-step warmup keeps the LR
                   near zero for a tiny run's handful of steps, so the
                   losses_decreased gate would fail vacuously)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
import zlib

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
APPS = os.path.join(REPO, "apps")
sys.path.insert(0, REPO)

STAGE_ORDER = ["train_clip", "parse_corpus", "train_clipcap", "predict",
               "score", "visualize", "json_to_text", "train_tokenizer",
               "train_clipcap_t5", "predict_t5", "score_t5"]


# ---------------------------------------------------------------- synthesis

def synth_image(ann, size=(240, 320)) -> "np.ndarray":
    """Deterministic class-structured RGB image for an annotation.

    violation_type -> base hue + horizontal stripe period; caption_type ->
    bright square (violation) vs disc (status) marker; per-file seed -> noise
    + marker position. Classes are visually separable so the contrastive
    objective and the zero-shot pseudo-labeling have learnable structure.
    """
    import numpy as np

    from construction_clip_tpu.data.labels import VIOLATION_TYPES

    h, w = size
    vt = ann.violation_type if ann.violation_type in VIOLATION_TYPES else None
    vt_idx = VIOLATION_TYPES.index(vt) if vt else len(VIOLATION_TYPES)
    seed = zlib.crc32(ann.file_name.encode()) & 0xFFFFFFFF
    rng = np.random.default_rng(seed)

    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    period = 8 + 6 * vt_idx
    stripes = 0.5 + 0.5 * np.sin(2 * np.pi * yy / period)
    hue = vt_idx / 10.0
    base = np.stack([
        stripes * (0.3 + 0.7 * hue),
        stripes * (1.0 - hue) * 0.8,
        0.25 + 0.5 * (xx / w),
    ], axis=-1)

    cy, cx = int(rng.integers(40, h - 40)), int(rng.integers(40, w - 40))
    r = 24
    if ann.caption_type == "violation":
        base[cy - r:cy + r, cx - r:cx + r] = (0.95, 0.1, 0.1)
    else:
        mask = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
        base[mask] = (0.1, 0.9, 0.2)

    noise = rng.normal(0, 0.06, base.shape)
    img = np.clip(base + noise, 0, 1)
    return (img * 255).astype(np.uint8)


def _round_robin_subset(anns, n: int, key=None):
    """First n annotations taken round-robin across violation_type classes, so
    a small subset still covers every class (PairGroupDataset needs >=
    combination_num distinct classes to form any group at all)."""
    key = key or (lambda a: a.violation_type)
    by_class: dict = {}
    for a in anns:
        by_class.setdefault(key(a), []).append(a)
    out = []
    i = 0
    while len(out) < n and any(by_class.values()):
        for cls in list(by_class):
            if i < len(by_class[cls]) and len(out) < n:
                out.append(by_class[cls][i])
        i += 1
    return out


def prepare_corpus(corpus_json: str, workdir: str, subset: int | None):
    """Synthesize images + write full/train/test split JSONs (80/20 by order —
    the reference's split, CLIP/train_caption.py:59-60). Returns paths."""
    import numpy as np
    from PIL import Image

    from construction_clip_tpu.data.schema import load_annotations

    anns = load_annotations(corpus_json)
    if subset:
        anns = _round_robin_subset(anns, subset)
    img_root = os.path.join(workdir, "images")
    for a in anns:
        path = os.path.join(img_root, a.file_name)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        if not os.path.exists(path):
            Image.fromarray(synth_image(a)).save(path, quality=90)

    raw = json.load(open(corpus_json, encoding="utf-8"))["annotations"]
    if subset:
        raw = _round_robin_subset(raw, subset,
                                  key=lambda a: a.get("violation_type", ""))
    cut = int(len(raw) * 0.8)
    paths = {}
    for name, subset_anns in (("full", raw), ("train", raw[:cut]), ("test", raw[cut:])):
        p = os.path.join(workdir, f"e2e_{name}.json")
        with open(p, "w", encoding="utf-8") as f:
            json.dump({"type": "captions", "annotations": subset_anns},
                      f, ensure_ascii=False)
        paths[name] = p
    print(f"corpus: {len(raw)} annotations ({cut} train / {len(raw)-cut} test), "
          f"images under {img_root}")
    return img_root, paths


# ---------------------------------------------------------------- stages

def run_stage(name: str, argv: list[str], env: dict, log_path: str) -> dict:
    if argv[0] == sys.executable:  # unbuffered so the log is pollable mid-run
        argv = [argv[0], "-u", *argv[1:]]
    print(f"\n=== stage {name}: {' '.join(argv)}", flush=True)
    t0 = time.time()
    with open(log_path, "w", encoding="utf-8") as log:
        proc = subprocess.run(argv, stdout=log, stderr=subprocess.STDOUT,
                              env=env, cwd=REPO)
    dt = time.time() - t0
    tail = "".join(open(log_path, encoding="utf-8").readlines()[-8:])
    print(f"--- {name}: rc={proc.returncode} {dt:.0f}s\n{tail}", flush=True)
    return {"stage": name, "argv": argv, "rc": proc.returncode,
            "seconds": round(dt, 1), "log": log_path}


def read_losses(jsonl_path: str, key: str = "loss"):
    if not os.path.exists(jsonl_path):
        return []
    out = []
    for line in open(jsonl_path, encoding="utf-8"):
        rec = json.loads(line)
        if key in rec:
            out.append((rec["step"], rec[key]))
    return out


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--corpus", default="/root/reference/all.json")
    p.add_argument("--workdir", default="runs/e2e")
    p.add_argument("--subset", type=int, default=None,
                   help="use only the first N annotations (CPU smoke)")
    p.add_argument("--arch", default="vit_b_32")
    p.add_argument("--gpt_size", default="base", choices=["base", "tiny"])
    p.add_argument("--device", default="tpu", choices=["tpu", "cpu"])
    p.add_argument("--clip_epochs", type=int, default=8)
    p.add_argument("--clip_lr", type=float, default=1e-4)
    # 1 == reference semantics (one class-balanced group per step). >1 packs
    # multiple groups into a batch but the groups' class-name TEXTS repeat, so
    # global InfoNCE is information-bounded at loss ln(groups): fine for
    # throughput scaling with --key violation_list/caption (distinct texts),
    # misleading for the 9-way class-name keys.
    p.add_argument("--clip_groups_per_batch", type=int, default=1)
    p.add_argument("--cap_epochs", type=int, default=60)
    p.add_argument("--cap_lr", type=float, default=1e-4)
    p.add_argument("--cap_bs", type=int, default=32)
    p.add_argument("--warmup", type=int, default=50,
                   help="short-run warmup override (reference's 5000 assumes "
                        "50k-step runs, CLIP/train.py:145-147)")
    p.add_argument("--beam", action="store_true", default=True)
    p.add_argument("--greedy", dest="beam", action="store_false")
    p.add_argument("--predict_bs", type=int, default=8,
                   help="stage-4 batch size (8 -> 24 beam rows, the shape "
                        "validated healthy on-chip; 16 -> 48 rows, the fp32 "
                        "worker-crash family)")
    p.add_argument("--t5", action="store_true", default=True,
                   help="also chain the mT5 decoder workflow (stages 7-11)")
    p.add_argument("--no_t5", dest="t5", action="store_false")
    p.add_argument("--t5_size", default="small", choices=["small", "tiny"])
    p.add_argument("--t5_epochs", type=int, default=None,
                   help="default: --cap_epochs")
    p.add_argument("--from_stage", type=int, default=1,
                   help="resume from stage N (artifacts of earlier stages must exist)")
    p.add_argument("--stages", default=None,
                   help="comma-separated stage names to (re)run; all other "
                        "stages are skipped and their records from the prior "
                        "summary.json are preserved (e.g. --stages predict,score "
                        "to re-decode on a different --device)")
    args = p.parse_args()

    wd = os.path.abspath(args.workdir)
    os.makedirs(wd, exist_ok=True)
    logdir = os.path.join(wd, "logs")
    os.makedirs(logdir, exist_ok=True)

    env = dict(os.environ)
    if args.device == "cpu":
        # tunnel-immune subprocesses: drop the axon sitecustomize (verify
        # skill: JAX_PLATFORMS=cpu alone does not stop the import-time probe)
        env["PYTHONPATH"] = REPO
        env["JAX_PLATFORMS"] = "cpu"
    else:
        env.setdefault("PYTHONPATH", REPO)

    # stage 0: offline assets + synthetic corpus
    assets = os.path.join(wd, "assets")
    os.makedirs(os.path.join(assets, "bert_zh_vocab"), exist_ok=True)
    merges = os.path.join(assets, "clip_bpe_offline.txt.gz")
    vocab_dir = os.path.join(assets, "bert_zh_vocab")
    if not os.path.exists(merges):
        subprocess.run([sys.executable, os.path.join(REPO, "tools/make_offline_assets.py"),
                        "--corpus", args.corpus, "--out_dir", assets,
                        *(["--tiny"] if args.arch.startswith("tiny") else [])],
                       check=True, env={**env, "PYTHONPATH": REPO, "JAX_PLATFORMS": "cpu"})
    img_root, paths = prepare_corpus(args.corpus, wd, args.subset)

    models = os.path.join(wd, "models")
    emb_npz = os.path.join(wd, "embedding.npz")
    out_dir = os.path.join(wd, "output")
    clip_npz = os.path.join(models, "clip_latest.npz")
    cap_npz = os.path.join(models, "clipcap.npz")

    stages = []
    # resuming: keep the stage records of the runs that produced the artifacts
    # we consume, so summary.json stays the complete pipeline record
    order = STAGE_ORDER
    if args.stages:
        selected = {s.strip() for s in args.stages.split(",")}
        unknown = selected - set(order)
        if unknown:
            sys.exit(f"unknown --stages {sorted(unknown)}; choose from {order}")
    else:
        selected = set(order[args.from_stage - 1:])
    if (selected != set(order)
            and os.path.exists(os.path.join(wd, "summary.json"))):
        prior = json.load(open(os.path.join(wd, "summary.json"),
                               encoding="utf-8")).get("stages", [])
        stages += [s for s in prior if s.get("stage") in set(order) - selected]

    def stage(n, name, argv):
        if name not in selected:
            print(f"=== stage {name}: skipped (resume: record preserved)")
            return
        res = run_stage(name, argv, env, os.path.join(logdir, f"{name}.log"))
        stages.append(res)
        if res["rc"] != 0:
            summary(stages, wd, ok=False)
            sys.exit(f"stage {name} failed; see {res['log']}")

    stage(1, "train_clip", [
        sys.executable, os.path.join(APPS, "train_clip.py"),
        "--json_path", paths["full"], "--image_path", img_root,
        "--arch", args.arch, "--clip_bpe", merges,
        "--epochs", str(args.clip_epochs), "--save_every", str(args.clip_epochs),
        "--lr", str(args.clip_lr), "--warmup_steps", str(args.warmup),
        "--groups_per_batch", str(args.clip_groups_per_batch),
        "--output_dir", models, "--output_prefix", "clip",
        "--log_dir", os.path.join(wd, "log_clip")])

    stage(2, "parse_corpus", [
        sys.executable, os.path.join(APPS, "parse_corpus.py"),
        "--json_path", paths["train"], "--image_root", img_root,
        "--checkpoint", clip_npz, "--clip_bpe", merges,
        *(["--arch", args.arch] if args.arch != "vit_b_32" else []),
        "--out", emb_npz])

    stage(3, "train_clipcap", [
        sys.executable, os.path.join(APPS, "train_clipcap.py"),
        "--data", emb_npz, "--out_dir", models, "--prefix", "clipcap",
        "--epochs", str(args.cap_epochs), "--save_every", str(args.cap_epochs),
        "--bs", str(args.cap_bs), "--lr", str(args.cap_lr),
        "--warmup_steps", str(args.warmup), "--gpt_size", args.gpt_size,
        "--tokenizer", vocab_dir, "--log_dir", os.path.join(wd, "log_cap")])

    stage(4, "predict", [
        sys.executable, os.path.join(APPS, "predict.py"),
        "--json_path", paths["test"], "--image_root", img_root,
        "--clip_checkpoint", clip_npz, "--arch", args.arch,
        "--caption_checkpoint", cap_npz, "--clip_bpe", merges,
        "--tokenizer", vocab_dir,
        *([] if args.beam else ["--greedy"]),
        "--batch_size", str(args.predict_bs), "--output_dir", out_dir])

    stage(5, "score", [
        sys.executable, os.path.join(APPS, "score.py"),
        os.path.join(out_dir, "output_log.json")])

    clip_log = os.path.join(wd, "log_clip", "clip_comb9.jsonl")
    cap_log = os.path.join(wd, "log_cap", "clipcap.jsonl")
    t5_log = os.path.join(wd, "log_t5", "t5_prefix.jsonl") if args.t5 else None
    stage(6, "visualize", [
        sys.executable, os.path.join(APPS, "visualize.py"),
        *[pth for pth in (clip_log, cap_log) if os.path.exists(pth)],
        "--keys", "loss", "--out", os.path.join(wd, "curves.png")])

    if args.t5:
        text_txt = os.path.join(wd, "text.txt")
        bpe_json = os.path.join(assets, "chinese_bpe.json")
        t5_npz = os.path.join(models, "t5_prefix.npz")

        stage(7, "json_to_text", [
            sys.executable, os.path.join(APPS, "json_to_text.py"),
            "--json_path", paths["train"], "--out", text_txt, "--key", "caption"])

        stage(8, "train_tokenizer", [
            sys.executable, os.path.join(APPS, "train_tokenizer.py"),
            "--input", text_txt, "--out", bpe_json])

        stage(9, "train_clipcap_t5", [
            sys.executable, os.path.join(APPS, "train_clipcap_t5.py"),
            "--data", emb_npz, "--out_dir", models, "--prefix", "t5_prefix",
            "--epochs", str(args.t5_epochs or args.cap_epochs),
            "--save_every", str(args.t5_epochs or args.cap_epochs),
            "--bs", str(args.cap_bs), "--lr", str(args.cap_lr),
            "--warmup_steps", str(args.warmup), "--t5_size", args.t5_size,
            "--tokenizer", bpe_json, "--log_dir", os.path.join(wd, "log_t5")])

        stage(10, "predict_t5", [
            sys.executable, os.path.join(APPS, "predict_t5.py"),
            "--json_path", paths["test"], "--image_root", img_root,
            "--clip_checkpoint", clip_npz, "--arch", args.arch,
            "--clip_bpe", merges, "--caption_checkpoint", t5_npz,
            "--tokenizer", bpe_json, "--t5_size", args.t5_size, "--greedy",
            "--batch_size", str(args.predict_bs),
            "--out", os.path.join(out_dir, "output_t5.json")])

        stage(11, "score_t5", [
            sys.executable, os.path.join(APPS, "score.py"),
            os.path.join(out_dir, "output_t5.json")])

    summary(stages, wd, ok=True, clip_log=clip_log, cap_log=cap_log,
            out_dir=out_dir, t5_log=t5_log)


def _read_score_json(stages, stage_name):
    logs = [s for s in stages if s["stage"] == stage_name]
    if not logs:
        return None
    try:
        txt = open(logs[0]["log"], encoding="utf-8").read()
        return json.loads(txt[txt.index("{"):])
    except (OSError, ValueError, KeyError):
        return None


def _read_preds(out_dir, fname):
    path = os.path.join(out_dir or "", fname)
    if not (out_dir and os.path.exists(path)):
        return None, None
    preds = json.load(open(path, encoding="utf-8"))
    return len(preds), len({p["caption"] for p in preds})


def summary(stages, wd, *, ok, clip_log=None, cap_log=None, out_dir=None,
            t5_log=None):
    stages = sorted(stages, key=lambda s: STAGE_ORDER.index(s["stage"])
                    if s.get("stage") in STAGE_ORDER else 99)
    out = {"ok": ok, "stages": stages}
    if ok:
        def curve(pts):
            if not pts:
                return None
            return {"first": pts[0], "last": pts[-1],
                    "min": min(p[1] for p in pts), "n": len(pts)}

        n_preds, uniq_caps = _read_preds(out_dir, "output_log.json")
        out.update({
            "clip_loss": curve(read_losses(clip_log)),
            "caption_loss": curve(read_losses(cap_log)),
            "score": _read_score_json(stages, "score"),
            "n_predictions": n_preds,
            "unique_captions": uniq_caps,
        })
        curves = [out["clip_loss"], out["caption_loss"]]
        if t5_log is not None:
            n_t5, uniq_t5 = _read_preds(out_dir, "output_t5.json")
            out.update({
                "t5_loss": curve(read_losses(t5_log)),
                "t5_score": _read_score_json(stages, "score_t5"),
                "t5_n_predictions": n_t5,
                "t5_unique_captions": uniq_t5,
            })
            curves.append(out["t5_loss"])
        # a missing curve is a FAILURE (a zero-step stage once produced a
        # vacuous pass here), as is a curve that never drops 2% below start
        decreased = all(c is not None and c["min"] < c["first"][1] * 0.98
                        for c in curves)
        out["losses_decreased"] = bool(decreased)
    path = os.path.join(wd, "summary.json")
    with open(path, "w", encoding="utf-8") as f:
        json.dump(out, f, ensure_ascii=False, indent=2)
    print(f"\nsummary -> {path}")
    print(json.dumps({k: v for k, v in out.items() if k != "stages"},
                     ensure_ascii=False, indent=2))
    if ok and not out.get("losses_decreased", False):
        sys.exit("losses did not decrease — see summary.json")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Block until the TPU worker decodes sanely (canary: 8-image beam-3 caption
batch on the runs/e2e checkpoints; healthy = >=6/8 non-empty, i.e. not in a
post-fault garbage window — see tools/diag_beam_variants.py), then exit 0.
Exit 1 if it never recovers within --tries. Model state loads once; each
attempt is one caption_images call.

Run: cd /root/repo && nohup python -u tools/wait_decode_healthy.py > /tmp/canary.log 2>&1 &
"""
import argparse
import json
import logging
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/apps")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/cctpu_xla"))
logging.basicConfig(level=logging.ERROR)

ap = argparse.ArgumentParser()
ap.add_argument("--tries", type=int, default=24)
ap.add_argument("--interval", type=float, default=300.0)
ap.add_argument("--threshold", type=int, default=6)
args = ap.parse_args()

import jax

from construction_clip_tpu.core.configs import ClipCapConfig, GPT2Config
from construction_clip_tpu.core.precision import BF16_POLICY
from construction_clip_tpu.data.pipeline import default_load_image, host_shape_unify
from construction_clip_tpu.data.preprocess import preprocess_batch
from construction_clip_tpu.infer.caption import CaptionPipeline
from construction_clip_tpu.models.clipcap import init_clipcap
from construction_clip_tpu.train.checkpoint import load_params_npz
from common import load_clip, load_clip_tokenizer, load_hf_tokenizer

print("backend:", jax.default_backend(), flush=True)
anns = json.load(open("runs/e2e/e2e_train.json", encoding="utf-8"))["annotations"][:8]
imgs = np.stack([host_shape_unify(default_load_image(
    os.path.join("runs/e2e/images", a["file_name"])), 256) for a in anns])
clip_params, clip_cfg = load_clip("runs/e2e/models/clip_latest.npz", arch="vit_b_32")
ccfg = ClipCapConfig(clip_dim=512)
gcfg = GPT2Config()
params = load_params_npz("runs/e2e/models/clipcap.npz",
                         init_clipcap(jax.random.key(0), ccfg, gcfg))
pipe = CaptionPipeline(
    clip_params=clip_params, clip_cfg=clip_cfg, cap_params=params,
    ccfg=ccfg, gcfg=gcfg,
    clip_tokenizer=load_clip_tokenizer("runs/e2e/assets/clip_bpe_offline.txt.gz",
                                       expect_vocab=clip_cfg.text.vocab_size),
    lm_tokenizer=load_hf_tokenizer("runs/e2e/assets/bert_zh_vocab"),
    policy=BF16_POLICY)
x = preprocess_batch(imgs, clip_cfg.vision.image_size)

for attempt in range(args.tries):
    t0 = time.time()
    out = pipe.caption_images(x, use_beam=True)
    ne = sum(1 for o in out if o["caption"])
    print(f"attempt {attempt}: nonempty={ne}/8 ({time.time()-t0:.0f}s)", flush=True)
    if ne >= args.threshold:
        print("HEALTHY", flush=True)
        sys.exit(0)
    time.sleep(args.interval)
print("NEVER_RECOVERED", flush=True)
sys.exit(1)

#!/usr/bin/env python
"""Verify drive: CaptionPipeline.caption_images with the round-4 decode-collapse
guard, on the real chip with the runs/e2e checkpoints. During a worker garbage
window the guard should log the collapse, retry greedy, and flag any rows that
stay collapsed as decode_suspect; in a healthy window it should pass through.

Run: cd /root/repo && nohup python -u tools/drive_guard_verify.py > /tmp/guard_verify.log 2>&1 &
"""
import json
import logging
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/apps")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/cctpu_xla"))
logging.basicConfig(level=logging.INFO)

import jax

from construction_clip_tpu.core.configs import ClipCapConfig, GPT2Config
from construction_clip_tpu.core.precision import BF16_POLICY
from construction_clip_tpu.data.pipeline import default_load_image, host_shape_unify
from construction_clip_tpu.data.preprocess import preprocess_batch
from construction_clip_tpu.infer.caption import CaptionPipeline
from construction_clip_tpu.models.clipcap import init_clipcap
from construction_clip_tpu.train.checkpoint import load_params_npz
from common import load_clip, load_clip_tokenizer, load_hf_tokenizer

N = 8
print("backend:", jax.default_backend(), flush=True)
anns = json.load(open("runs/e2e/e2e_train.json", encoding="utf-8"))["annotations"][:N]
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
out = pipe.caption_images(x, use_beam=True)
for o in out:
    print({"attr": o["attribute"], "cap": o["caption"],
           "suspect": o["decode_suspect"]}, flush=True)
ne = sum(1 for o in out if o["caption"])
sus = sum(1 for o in out if o["decode_suspect"])
print(f"nonempty={ne}/{N} suspect={sus}/{N}", flush=True)
print("GUARD_VERIFY_DONE", flush=True)

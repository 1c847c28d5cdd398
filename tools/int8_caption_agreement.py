#!/usr/bin/env python
"""int8 caption agreement with TRAINED weights (round 4).

Round 3 measured caption agreement 0.0 between bf16 and int8 serving towers —
on RANDOM weights, where quantization noise chaotically reroutes every decode
(tools/bench_serve.py:6-11 documents the explanation). The e2e run produced
actual trained checkpoints (runs/e2e/models: fine-tuned CLIP + converged
ClipCap); this re-measures the claim the int8 path was waiting on: with a
trained model, weight-only int8 GPT-2 + int8 CLIP towers should mostly
reproduce the bf16 captions.

Prints one JSON line: greedy caption agreement (exact-match fraction), CLIP
feature cosine, and both caption lists. Run on axon from /root/repo (nohup).
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/apps")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/cctpu_xla"))

import jax

from construction_clip_tpu.core.configs import ClipCapConfig, GPT2Config
from construction_clip_tpu.core.precision import BF16_POLICY
from construction_clip_tpu.data.pipeline import default_load_image, host_shape_unify
from construction_clip_tpu.data.preprocess import preprocess_batch
from construction_clip_tpu.infer.caption import CaptionPipeline
from construction_clip_tpu.models.clipcap import init_clipcap
from construction_clip_tpu.models.clip.quant import quantize_clip
from construction_clip_tpu.models.gpt2 import quantize_gpt2
from construction_clip_tpu.train.checkpoint import load_params_npz
from common import load_clip, load_clip_tokenizer, load_hf_tokenizer

N = 16
print("backend:", jax.default_backend(), flush=True)
anns = json.load(open("runs/e2e/e2e_train.json", encoding="utf-8"))["annotations"][:N]
imgs = np.stack([host_shape_unify(default_load_image(
    os.path.join("runs/e2e/images", a["file_name"])), 256) for a in anns])
clip_params, clip_cfg = load_clip("runs/e2e/models/clip_latest.npz", arch="vit_b_32")
ccfg = ClipCapConfig(clip_dim=512)
gcfg = GPT2Config()
cap_params = load_params_npz("runs/e2e/models/clipcap.npz",
                             init_clipcap(jax.random.key(0), ccfg, gcfg))
kw = dict(ccfg=ccfg, gcfg=gcfg,
          clip_tokenizer=load_clip_tokenizer(
              "runs/e2e/assets/clip_bpe_offline.txt.gz",
              expect_vocab=clip_cfg.text.vocab_size),
          lm_tokenizer=load_hf_tokenizer("runs/e2e/assets/bert_zh_vocab"),
          policy=BF16_POLICY)
pipe = CaptionPipeline(clip_params=clip_params, clip_cfg=clip_cfg,
                       cap_params=cap_params, **kw)
qpipe = CaptionPipeline(
    clip_params=quantize_clip(clip_params), clip_cfg=clip_cfg,
    cap_params=dict(cap_params, gpt=quantize_gpt2(cap_params["gpt"])), **kw)

x = preprocess_batch(imgs, clip_cfg.vision.image_size)
f_bf = np.asarray(pipe.classify_and_embed(x)[0], np.float32)
f_i8 = np.asarray(qpipe.classify_and_embed(x)[0], np.float32)
cos = float(np.mean(np.sum(f_bf * f_i8, -1)
                    / (np.linalg.norm(f_bf, axis=-1)
                       * np.linalg.norm(f_i8, axis=-1))))

out_bf = pipe.caption_images(x, use_beam=False)
out_i8 = qpipe.caption_images(x, use_beam=False)
caps_bf = [o["caption"] for o in out_bf]
caps_i8 = [o["caption"] for o in out_i8]
sus = (sum(o["decode_suspect"] for o in out_bf)
       + sum(o["decode_suspect"] for o in out_i8))
agree = float(np.mean([a == b for a, b in zip(caps_bf, caps_i8)]))
attrs_agree = float(np.mean([a["attribute"] == b["attribute"]
                             for a, b in zip(out_bf, out_i8)]))
print(json.dumps({"n": N, "clip_cos": round(cos, 4),
                  "caption_agreement": round(agree, 4),
                  "attribute_agreement": round(attrs_agree, 4),
                  "decode_suspect_rows": int(sus),
                  "caps_bf16": caps_bf, "caps_int8": caps_i8},
                 ensure_ascii=False), flush=True)
print("INT8_AGREE_DONE", flush=True)

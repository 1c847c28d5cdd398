#!/usr/bin/env python
"""On-chip bisection of the empty-caption e2e failure (round 4).

CPU reproductions all produce real captions (fp32/bf16 decode x npz/rounded/
re-encoded prefix — tools/diag_e2e_captions.py), so the fault is TPU-specific.
This script isolates, on the chip at B=8 with the real e2e checkpoints:

  1. TPU bf16 CLIP encode vs the stage-2 npz rows (rel err; Pallas fused
     attention block runs here, unlike CPU)
  2. TPU bf16 classify (ct/vt) vs stage-2 attributes
  3. beam bf16 from a HOST-built prompt (npz prefix, so decode is isolated)
  4. beam bf16 from the TPU-recomputed prompt (full stage-4 path)
  5. greedy bf16 from both prompts

Run: nohup python -u tools/diag_e2e_tpu.py > /tmp/diag_tpu.log 2>&1 &
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
import jax.numpy as jnp

from construction_clip_tpu.core.configs import ClipCapConfig, GPT2Config
from construction_clip_tpu.core.precision import BF16_POLICY
from construction_clip_tpu.data.pipeline import default_load_image, host_shape_unify
from construction_clip_tpu.data.preprocess import preprocess_batch
from construction_clip_tpu.infer.caption import CaptionPipeline
from construction_clip_tpu.infer.decode import beam_decode, greedy_decode
from construction_clip_tpu.infer.precompute import (load_archive,
                                                    tokenize_for_caption_training)
from construction_clip_tpu.models import gpt2 as gpt2_lib
from construction_clip_tpu.models.clipcap import init_clipcap, map_prefix
from construction_clip_tpu.train.checkpoint import load_params_npz
from common import load_clip, load_clip_tokenizer, load_hf_tokenizer

N = 8
print("backend:", jax.default_backend(), flush=True)

anns = json.load(open("runs/e2e/e2e_train.json", encoding="utf-8"))["annotations"][:N]
imgs = np.stack([host_shape_unify(default_load_image(
    os.path.join("runs/e2e/images", a["file_name"])), 256) for a in anns])
clip_params, clip_cfg = load_clip("runs/e2e/models/clip_latest.npz", arch="vit_b_32")
arch = load_archive("runs/e2e/embedding.npz")
tok = load_hf_tokenizer("runs/e2e/assets/bert_zh_vocab")
ccfg = ClipCapConfig(clip_dim=512)
gcfg = GPT2Config()
params = load_params_npz("runs/e2e/models/clipcap.npz",
                         init_clipcap(jax.random.key(0), ccfg, gcfg))
data = tokenize_for_caption_training(arch, tok, attribute_length=ccfg.attribute_length)
npz_pref = data["prefix"][:N]
attr = jnp.asarray(data["attribute"][:N])

pipe = CaptionPipeline(
    clip_params=clip_params, clip_cfg=clip_cfg, cap_params=params,
    ccfg=ccfg, gcfg=gcfg,
    clip_tokenizer=load_clip_tokenizer("runs/e2e/assets/clip_bpe_offline.txt.gz",
                                       expect_vocab=clip_cfg.text.vocab_size),
    lm_tokenizer=tok, policy=BF16_POLICY)

x = preprocess_batch(imgs, clip_cfg.vision.image_size)

# 1+2: TPU bf16 encode + classify vs stage-2 npz
emb_d, ct_d, vt_d = pipe._embed_classify(x)
emb = np.asarray(emb_d, np.float32)
ct, vt = np.asarray(ct_d), np.asarray(vt_d)
rel = np.linalg.norm(emb - npz_pref, axis=-1) / np.linalg.norm(npz_pref, axis=-1)
print("TPU bf16 encode vs npz rel err:", rel.round(4).tolist(), flush=True)
print("TPU classify ct/vt:", ct.tolist(), vt.tolist())
print("stage-2 attributes:", [str(a) for a in arch["attributes"][:N]])

def decode_text(t, l):
    ids = [int(v) for v in t[: int(l)] if int(v) != 102]
    return tok.decode(ids, skip_special_tokens=True).replace(" ", "")

def report(tag, prompt, use_beam=True):
    if use_beam:
        r = beam_decode(params["gpt"], gcfg, prompt, beam_size=3, max_steps=100,
                        stop_token=102, temperature=0.5, policy=BF16_POLICY)
        t, l = np.asarray(r.tokens)[:, 0], np.asarray(r.lengths)[:, 0]
    else:
        r = greedy_decode(params["gpt"], gcfg, prompt, max_steps=100,
                          stop_token=102, policy=BF16_POLICY)
        t, l = np.asarray(r.tokens), np.asarray(r.lengths)
    caps = [decode_text(t[i], l[i]) for i in range(N)]
    print(f"{tag}: lens={l.tolist()} caps={caps}", flush=True)

# 3+5a: host(npz)-prefix prompt
pre = map_prefix(params["mapper"], ccfg, gcfg, jnp.asarray(npz_pref),
                 policy=BF16_POLICY)
ae = gpt2_lib.embed_tokens(params["gpt"], attr, policy=BF16_POLICY)
prompt_npz = jnp.concatenate([pre.astype(ae.dtype), ae], axis=1)
report("beam/npz-prefix", prompt_npz)
report("greedy/npz-prefix", prompt_npz, use_beam=False)

# 4+5b: full TPU-recomputed prompt (uses the device attr table like stage 4)
attr_tok = pipe._attr_table[ct_d * 9 + vt_d]
prompt_tpu = pipe.prompt_embeds(emb_d, attr_tok)
d = float(jnp.max(jnp.abs(prompt_tpu.astype(jnp.float32)
                          - prompt_npz.astype(jnp.float32))))
print(f"prompt max|diff| tpu-recomputed vs npz-built: {d:.4f}")
report("beam/tpu-prompt", prompt_tpu)
report("greedy/tpu-prompt", prompt_tpu, use_beam=False)

# 6: the exact caption_images path
out = pipe.caption_images(x, use_beam=True)
print("caption_images:", [(o["attribute"], o["caption"]) for o in out])
print("DIAG_DONE", flush=True)

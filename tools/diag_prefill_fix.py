#!/usr/bin/env python
"""On-chip validation of the bf16 prefill fix (round 4).

The round-4 e2e run produced empty captions on TPU: bf16 prefill into a PADDED
KV-cache window returned garbage logits (argmax 0 on every row) while the
exact-size window, fp32 compute, CPU, and the uncached forward were all correct
(tools/diag_e2e_tpu.py, /tmp/diag_tpu{2,3}.log). models/gpt2.py now computes
prefill attention from the chunk's fresh q/k/v (_attn_uncached) and only WRITES
the cache. This script checks, on the real chip with the real e2e checkpoints:

  1. fixed bf16 prefill last-logits argmax == uncached bf16 forward argmax
  2. bf16 greedy decode == fp32 greedy decode token-for-token (fp32 was correct)
  3. bf16 beam-3 produces non-empty captions from both the host-built and the
     TPU-recomputed prompt
  4. the full CaptionPipeline.caption_images path produces captions

Run: cd /root/repo && nohup python -u tools/diag_prefill_fix.py > /tmp/diag6.log 2>&1 &
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
from construction_clip_tpu.core.precision import BF16_POLICY, DEFAULT_POLICY
from construction_clip_tpu.data.pipeline import default_load_image, host_shape_unify
from construction_clip_tpu.data.preprocess import preprocess_batch
from construction_clip_tpu.infer.caption import CaptionPipeline
from construction_clip_tpu.infer.decode import _precast, _prefill, beam_decode, greedy_decode
from construction_clip_tpu.infer.precompute import (load_archive,
                                                    tokenize_for_caption_training)
from construction_clip_tpu.models import gpt2 as gpt2_lib
from construction_clip_tpu.models.gpt2 import gpt2_forward
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

pol = BF16_POLICY
pre = map_prefix(params["mapper"], ccfg, gcfg, jnp.asarray(npz_pref), policy=pol)
ae = gpt2_lib.embed_tokens(params["gpt"], attr, policy=pol)
prompt = jnp.concatenate([pre.astype(ae.dtype), ae], axis=1)
p = _precast(params["gpt"], pol)

def amax(lg):
    return np.asarray(lg.astype(jnp.float32)).argmax(-1).tolist()

# 1: uncached ground truth vs fixed prefill (bf16, padded window)
lg0, _ = jax.jit(lambda p, x: gpt2_forward(p, gcfg, inputs_embeds=x, policy=pol))(p, prompt)
a0 = amax(lg0[:, -1])
print("uncached bf16 last argmax:", a0, flush=True)

last, _ = jax.jit(lambda p, x: _prefill(p, gcfg, x, 100, pol))(p, prompt)
a1 = amax(last)
print("FIXED prefill bf16 argmax:", a1, " match:", a0 == a1, flush=True)

def decode_text(t, l):
    ids = [int(v) for v in t[: int(l)] if int(v) != 102]
    return tok.decode(ids, skip_special_tokens=True).replace(" ", "")

# 2: bf16 greedy vs fp32 greedy
for tag, pol_i in (("bf16", BF16_POLICY), ("fp32", DEFAULT_POLICY)):
    r = greedy_decode(params["gpt"], gcfg, prompt.astype(jnp.float32), max_steps=100,
                      stop_token=102, policy=pol_i)
    t, l = np.asarray(r.tokens), np.asarray(r.lengths)
    caps = [decode_text(t[i], l[i]) for i in range(N)]
    print(f"greedy/{tag}: lens={l.tolist()}", flush=True)
    print(f"  caps={caps}", flush=True)
    if tag == "bf16":
        t_b, l_b = t, l
    else:
        same = [bool((t_b[i][:l[i]] == t[i][:l[i]]).all() and l_b[i] == l[i])
                for i in range(N)]
        print("  bf16==fp32 token-exact per row:", same, flush=True)

# 3: bf16 beam from the host-built prompt
r = beam_decode(params["gpt"], gcfg, prompt, beam_size=3, max_steps=100,
                stop_token=102, temperature=0.5, policy=pol)
t, l = np.asarray(r.tokens)[:, 0], np.asarray(r.lengths)[:, 0]
print("beam/npz-prefix bf16: lens=", l.tolist(), flush=True)
print("  caps=", [decode_text(t[i], l[i]) for i in range(N)], flush=True)

# 4: full pipeline (TPU-recomputed prompt, device attr table, beam)
pipe = CaptionPipeline(
    clip_params=clip_params, clip_cfg=clip_cfg, cap_params=params,
    ccfg=ccfg, gcfg=gcfg,
    clip_tokenizer=load_clip_tokenizer("runs/e2e/assets/clip_bpe_offline.txt.gz",
                                       expect_vocab=clip_cfg.text.vocab_size),
    lm_tokenizer=tok, policy=pol)
x = preprocess_batch(imgs, clip_cfg.vision.image_size)
out = pipe.caption_images(x, use_beam=True)
print("caption_images:", [(o["attribute"], o["caption"]) for o in out], flush=True)
print("DIAG6_DONE", flush=True)

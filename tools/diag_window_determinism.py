#!/usr/bin/env python
"""During a garbage window: is the corruption DETERMINISTIC per window?

Runs the same beam-3 B=8 program on the same inputs 3x in one process, and
greedy B=8 3x, comparing tokens across repeats. Determines whether in-window
retries can ever help (nondeterministic garbage) or the window corrupts a
program's results stably (deterministic — only waiting it out works, which is
what ~60 failed in-window retries during the 20:05-20:55 e2e rerun already
suggest).

Run: cd /root/repo && nohup python -u tools/diag_window_determinism.py > /tmp/diag_det.log 2>&1 &
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
from construction_clip_tpu.infer.decode import beam_decode, greedy_decode
from construction_clip_tpu.infer.precompute import (load_archive,
                                                    tokenize_for_caption_training)
from construction_clip_tpu.models import gpt2 as gpt2_lib
from construction_clip_tpu.models.clipcap import init_clipcap, map_prefix
from construction_clip_tpu.train.checkpoint import load_params_npz
from common import load_hf_tokenizer

N = 8
print("backend:", jax.default_backend(), flush=True)
arch = load_archive("runs/e2e/embedding.npz")
tok = load_hf_tokenizer("runs/e2e/assets/bert_zh_vocab")
ccfg = ClipCapConfig(clip_dim=512)
gcfg = GPT2Config()
params = load_params_npz("runs/e2e/models/clipcap.npz",
                         init_clipcap(jax.random.key(0), ccfg, gcfg))
data = tokenize_for_caption_training(arch, tok, attribute_length=ccfg.attribute_length)
pol = BF16_POLICY
pre = map_prefix(params["mapper"], ccfg, gcfg, jnp.asarray(data["prefix"][:N]),
                 policy=pol)
ae = gpt2_lib.embed_tokens(params["gpt"], jnp.asarray(data["attribute"][:N]),
                           policy=pol)
prompt = jnp.concatenate([pre.astype(ae.dtype), ae], axis=1)

out = {}
for mode in ("beam", "greedy"):
    runs = []
    for r in range(3):
        if mode == "beam":
            res = beam_decode(params["gpt"], gcfg, prompt, beam_size=3,
                              max_steps=100, stop_token=102, temperature=0.5,
                              policy=pol)
            t = np.asarray(res.tokens)[:, 0]
        else:
            res = greedy_decode(params["gpt"], gcfg, prompt, max_steps=100,
                                stop_token=102, policy=pol)
            t = np.asarray(res.tokens)
        runs.append(t)
        nz = int((t != 0).sum())
        print(f"{mode} run{r}: nonzero-token count {nz}", flush=True)
    same01 = bool((runs[0] == runs[1]).all())
    same12 = bool((runs[1] == runs[2]).all())
    out[mode] = {"identical_01": same01, "identical_12": same12,
                 "nonzero": [int((t != 0).sum()) for t in runs]}
print(json.dumps(out), flush=True)
print("DIAG_DET_DONE", flush=True)

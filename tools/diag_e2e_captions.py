#!/usr/bin/env python
"""Diagnose empty e2e captions: with the stage-2 npz prefixes and the stage-3
checkpoint, compare (a) teacher-forced next-token accuracy on train rows,
(b) the training forward's first-caption-position logits vs the decode path's
first-step logits (must be identical — same prompt), and (c) a greedy rollout.

CPU-forced; uses the runs/e2e artifacts.
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from construction_clip_tpu.core.configs import ClipCapConfig, GPT2Config
from construction_clip_tpu.infer.decode import greedy_decode
from construction_clip_tpu.infer.precompute import (load_archive,
                                                    tokenize_for_caption_training)
from construction_clip_tpu.models import gpt2 as gpt2_lib
from construction_clip_tpu.models.clipcap import (clipcap_forward, init_clipcap,
                                                  map_prefix)
from construction_clip_tpu.train.checkpoint import load_params_npz

sys.path.insert(0, "/root/repo/apps")
from common import load_hf_tokenizer

N = 4
arch = load_archive("runs/e2e/embedding.npz")
tok = load_hf_tokenizer("runs/e2e/assets/bert_zh_vocab")
ccfg = ClipCapConfig(clip_dim=512)
gcfg = GPT2Config()
params = load_params_npz("runs/e2e/models/clipcap.npz",
                         init_clipcap(jax.random.key(0), ccfg, gcfg))

data = tokenize_for_caption_training(arch, tok, attribute_length=ccfg.attribute_length)
sel = np.arange(N)
prefix = jnp.asarray(data["prefix"][sel])
tokens = jnp.asarray(data["tokens"][sel])
attr = jnp.asarray(data["attribute"][sel])
print("tokens[0]:", np.asarray(tokens[0])[:16])
print("attr[0]:  ", np.asarray(attr[0])[:16])

# (a) teacher-forced accuracy on caption positions
logits = clipcap_forward(params, ccfg, gcfg, tokens=tokens, clip_embed=prefix,
                         attribute_tokens=attr)
off = ccfg.prefix_length + ccfg.attribute_length
pred = np.asarray(jnp.argmax(logits[:, off - 1:-1], -1))
tgt = np.asarray(tokens)
mask = tgt != 0
acc = (pred == tgt)[mask].mean()
print(f"teacher-forced argmax accuracy on caption tokens: {acc:.3f}")
print("pred[0]:", pred[0][: mask[0].sum() + 2])
print("tgt [0]:", tgt[0][: mask[0].sum() + 2])

# (b) first-step logits: training fwd at position off-1 vs decode path prefill
prefix_emb = map_prefix(params["mapper"], ccfg, gcfg, prefix)
attr_emb = gpt2_lib.embed_tokens(params["gpt"], attr)
prompt = jnp.concatenate([prefix_emb.astype(attr_emb.dtype), attr_emb], axis=1)
train_first = np.asarray(logits[:, off - 1])

res = greedy_decode(params["gpt"], gcfg, prompt, max_steps=12, stop_token=102)
toks, lens = np.asarray(res.tokens), np.asarray(res.lengths)
print("greedy tokens:", toks[:, :12].tolist())
print("greedy lens:", lens.tolist())

# recompute decode-path first logits directly: forward the PROMPT alone
lg2, _ = gpt2_lib.gpt2_forward(params["gpt"], gcfg, inputs_embeds=prompt)
dec_first = np.asarray(lg2[:, -1])
d = np.abs(train_first - dec_first).max()
print(f"first-step logits max|diff| train-fwd vs prompt-fwd: {d:.3e}")
print("train-first argmax:", train_first.argmax(-1), "prompt-first argmax:",
      dec_first.argmax(-1))
top = np.argsort(dec_first[0])[::-1][:5]
import jax.nn as jnn
p = np.asarray(jnn.softmax(jnp.asarray(dec_first[0])))
print("row0 top5:", [(int(t), float(p[t])) for t in top])
for i in range(N):
    ids = [int(t) for t in toks[i, : lens[i]] if int(t) != 102]
    print(f"greedy[{i}]:", tok.decode(ids, skip_special_tokens=True).replace(" ", ""),
          "| gt:", str(arch["captions"][sel[i]]))

# (d) beam on CPU, same prompts — separates beam semantics from bf16/TPU
from construction_clip_tpu.infer.decode import beam_decode

bres = beam_decode(params["gpt"], gcfg, prompt, beam_size=3, max_steps=40,
                   stop_token=102, temperature=0.5)
btoks, blens = np.asarray(bres.tokens), np.asarray(bres.lengths)
bscores = np.asarray(bres.scores) if hasattr(bres, "scores") else None
print("beam lens:", blens.tolist())
if bscores is not None:
    print("beam scores:", np.round(bscores, 3).tolist())
for i in range(N):
    for b in range(3):
        ids = [int(t) for t in btoks[i, b, : blens[i, b]] if int(t) != 102]
        txt = tok.decode(ids, skip_special_tokens=True).replace(" ", "")
        print(f"beam[{i},{b}] len={blens[i,b]}:", txt)

# P(SEP | prompt + CLS): step the model one token past CLS
cls_emb = gpt2_lib.embed_tokens(params["gpt"], jnp.full((N, 1), 101, jnp.int32))
lg3, _ = gpt2_lib.gpt2_forward(params["gpt"], gcfg,
                               inputs_embeds=jnp.concatenate([prompt, cls_emb], 1))
pr = np.asarray(jax.nn.softmax(lg3[:, -1].astype(jnp.float32)))
print("P(SEP|prompt,CLS):", pr[:, 102].round(4).tolist(),
      " argmax:", pr.argmax(-1).tolist())

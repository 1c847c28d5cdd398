"""Zero-shot classification over label prompt sets.

Reference behavior (reference predict.py:26-36, application.py:80-90,
CLIP_prefix_caption/parse_coco.py:45-56): encode the image, encode each label prompt,
softmax over cosine-similarity logits, argmax -> label. The reference re-encodes the
label prompts for every image; here prompt features are computed once and reused, and
classification over a BATCH of images is one matmul.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from construction_clip_tpu.core.configs import CLIPConfig
from construction_clip_tpu.core.precision import Policy, DEFAULT_POLICY
from construction_clip_tpu.models.clip import encode_image, encode_text


def label_features(params, cfg: CLIPConfig, label_tokens, *, policy=DEFAULT_POLICY):
    """[n_labels, ctx] tokens -> [n_labels, embed] L2-normalized features."""
    return encode_text(params, cfg, label_tokens, policy=policy, normalize=True)


@functools.partial(jax.jit, static_argnames=("cfg", "policy"))
def classify_batch(params, cfg: CLIPConfig, images, label_feats, *,
                   policy: Policy = DEFAULT_POLICY):
    """images [B,H,W,3] x label_feats [L,E] -> (probs [B,L], pred [B]).

    Uses exp(logit_scale) * cosine similarity then softmax, matching
    `model(image, text)` + softmax in the reference (predict.py:33-35).
    """
    img = encode_image(params, cfg, images, policy=policy, normalize=True)
    logits = jnp.exp(params["logit_scale"]) * img @ label_feats.T
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return probs, jnp.argmax(probs, axis=-1)


def classify(params, cfg: CLIPConfig, images, label_tokens, *,
             policy: Policy = DEFAULT_POLICY):
    feats = label_features(params, cfg, label_tokens, policy=policy)
    return classify_batch(params, cfg, images, feats, policy=policy)

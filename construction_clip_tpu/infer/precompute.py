"""Embedding precompute + attribute pseudo-labeling — the parse_coco.py equivalent.

Reference behavior (reference CLIP_prefix_caption/parse_coco.py:15-69): for every
annotation, encode the image with the fine-tuned CLIP, zero-shot classify caption_type
('現況'/'缺失') and violation_type (9 classes), build the attribute string
f"{caption_type} {violation_type} " (parse_coco.py:56), and dump
{clip_embedding, captions+attribute} to a pickle consumed by ClipCocoDataset.

TPU redesign: the reference runs ONE image per loop iteration (parse_coco.py:37-59,
three model calls per image). Here the whole corpus streams through the batched
pipeline; embedding + both classifications come out of a single jitted forward per
batch (label features precomputed once), giving corpus-scale throughput. Output is a
portable .npz instead of a torch pickle.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from construction_clip_tpu.core.configs import CLIPConfig
from construction_clip_tpu.core.precision import Policy, DEFAULT_POLICY
from construction_clip_tpu.data.labels import (
    CAPTION_TYPE_PROMPTS, VIOLATION_TYPES, attribute_string)
from construction_clip_tpu.models.clip import encode_image, encode_text


def make_embed_classify_fn(params, cfg: CLIPConfig, ct_tokens, vt_tokens, *,
                           policy: Policy = DEFAULT_POLICY):
    """One jitted function: images -> (embeddings [B,E], caption_type idx [B],
    violation_type idx [B]).

    Params and label features are passed as jit ARGUMENTS, never closed over:
    closure-captured arrays become inline constants in the serialized program, and
    the TPU runtime's remote_compile endpoint rejects oversized programs (HTTP 413
    observed with 151M params baked in)."""
    ct_feats = encode_text(params, cfg, jnp.asarray(ct_tokens), policy=policy,
                           normalize=True)
    vt_feats = encode_text(params, cfg, jnp.asarray(vt_tokens), policy=policy,
                           normalize=True)
    # int8-serving params (models/clip/quant.quantize_clip) are detected
    # structurally; the text tower in that tree is plain bf16, so label feature
    # computation above is unchanged.
    quantized = isinstance(params["vision"]["patch_embed"], dict)

    @jax.jit
    def fn(params, ct_feats, vt_feats, images):
        if quantized:
            from construction_clip_tpu.models.clip.quant import encode_image_int8

            emb = encode_image_int8(params, cfg, images, normalize=False)
        else:
            emb = encode_image(params, cfg, images, policy=policy, normalize=False)
        normed = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
        ct = jnp.argmax(normed @ ct_feats.T, axis=-1)
        vt = jnp.argmax(normed @ vt_feats.T, axis=-1)
        return emb, ct, vt

    import functools

    return functools.partial(fn, params, ct_feats, vt_feats)


def precompute_corpus(params, cfg: CLIPConfig, annotations, tokenizer, *,
                      image_root: str = "", batch_size: int = 64,
                      load_image: Optional[Callable] = None,
                      preprocess: Optional[Callable] = None,
                      policy: Policy = DEFAULT_POLICY,
                      out_path: Optional[str] = None):
    """annotations: list[Annotation]. Returns dict with keys
    embeddings [N,E] f32, attributes [N] str, captions [N] str — and saves .npz.

    Caption fallback: annotations with an empty caption use violation_list
    (reference ClipCocoDataset, CLIP_prefix_caption/train.py:85-86).
    """
    import os

    from construction_clip_tpu.data.pipeline import default_load_image
    from construction_clip_tpu.data.preprocess import preprocess_batch

    load_image = load_image or default_load_image
    preprocess = preprocess or (lambda u8: preprocess_batch(u8, cfg.vision.image_size))

    ct_tokens = tokenizer.tokenize(list(CAPTION_TYPE_PROMPTS), cfg.text.context_length)
    vt_tokens = tokenizer.tokenize(list(VIOLATION_TYPES), cfg.text.context_length)
    fn = make_embed_classify_fn(params, cfg, ct_tokens, vt_tokens, policy=policy)

    embs, attrs, caps = [], [], []
    batch_imgs, kept = [], []

    def flush():
        if not batch_imgs:
            return
        u8 = np.stack(batch_imgs)
        emb, ct, vt = fn(preprocess(u8))
        embs.append(np.asarray(emb, dtype=np.float32))
        for a, c, v in zip(kept, np.asarray(ct), np.asarray(vt)):
            attrs.append(attribute_string(CAPTION_TYPE_PROMPTS[int(c)],
                                          VIOLATION_TYPES[int(v)]))
            caps.append(a.caption if a.caption else a.violation_list)
        batch_imgs.clear()
        kept.clear()

    from construction_clip_tpu.data.pipeline import host_shape_unify

    for a in annotations:
        try:
            img = load_image(os.path.join(image_root, a.file_name))
        except (FileNotFoundError, OSError) as e:  # mirror reference's skip-on-error
            print(f"skip {a.file_name}: {e}")
            continue
        batch_imgs.append(host_shape_unify(img, 256))
        kept.append(a)
        if len(batch_imgs) == batch_size:
            flush()
    flush()

    out = {
        "embeddings": np.concatenate(embs) if embs else np.zeros((0, cfg.text.embed_dim), np.float32),
        "attributes": np.asarray(attrs, dtype=object),
        "captions": np.asarray(caps, dtype=object),
    }
    if out_path:
        np.savez(out_path, embeddings=out["embeddings"],
                 attributes=np.asarray(attrs), captions=np.asarray(caps))
    return out


def load_reference_pickle(path: str) -> dict:
    """Drop-in compat: read the reference's parse_coco pickle
    ({"clip_embedding": Tensor[N,512], "captions": [annotation + {clip_embedding:
    idx, attribute: str}]}, reference parse_coco.py:55-65) into the archive dict
    precompute_corpus produces, so existing .pkl artifacts train directly."""
    import pickle

    with open(path, "rb") as f:
        data = pickle.load(f)
    emb = data.get("clip_embedding", data.get("clip_embeddings"))
    if hasattr(emb, "detach"):
        emb = emb.detach().cpu().numpy()
    captions, attrs = [], []
    for ann in data["captions"]:
        captions.append(ann.get("caption") or ann.get("violation_list") or "")
        attrs.append(ann.get("attribute", ""))
    return {"embeddings": np.asarray(emb, dtype=np.float32),
            "attributes": np.asarray(attrs, dtype=object),
            "captions": np.asarray(captions, dtype=object)}


def load_archive(path: str) -> dict:
    """Load either our .npz or the reference's .pkl embedding archive."""
    if path.endswith(".pkl"):
        return load_reference_pickle(path)
    return dict(np.load(path, allow_pickle=True))


def tokenize_for_caption_training(archive, hf_tokenizer, *, attribute_length: int,
                                  max_seq_len: Optional[int] = None):
    """archive: dict from precompute_corpus. Tokenize captions (zero-padded, like the
    reference's 0-padding at CLIP_prefix_caption/train.py:46-49) and attributes
    (padded/truncated to attribute_length, train.py:536-538 in test.py's predict).

    max_seq_len default: min(mean + 10*std, max) over caption lengths — the
    reference's rule (train.py:107).
    """
    cap_ids = [hf_tokenizer.encode(str(c)) for c in archive["captions"]]
    lens = np.asarray([len(c) for c in cap_ids]) if cap_ids else np.zeros(1, int)
    if max_seq_len is None:
        max_seq_len = int(min(lens.mean() + 10 * lens.std(), lens.max()))
    toks = np.zeros((len(cap_ids), max_seq_len), np.int32)
    for i, ids in enumerate(cap_ids):
        ids = ids[:max_seq_len]
        toks[i, : len(ids)] = ids
    attr = np.zeros((len(cap_ids), attribute_length), np.int32)
    for i, a in enumerate(archive["attributes"]):
        ids = hf_tokenizer.encode(str(a))[:attribute_length]
        attr[i, : len(ids)] = ids
    return {"prefix": archive["embeddings"].astype(np.float32),
            "tokens": toks, "attribute": attr}

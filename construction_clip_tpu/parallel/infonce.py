"""Global-batch symmetric InfoNCE over a device mesh.

Reference loss (single device): logits = model(image, text); labels = arange(B);
loss = (CE(logits_per_image, labels) + CE(logits_per_text, labels)) / 2
(reference CLIP/train.py:161-166).

TPU-native version: each chip encodes its batch shard, then the FEATURES (not images)
are all-gathered over the "data" ICI axis so every chip scores its local rows against
the GLOBAL batch — the memory-efficient local-loss formulation (each chip materializes
only a [local_B, global_B] logit block, never the full [global_B, global_B] matrix).
Gradients flow through the all-gather (jax differentiates the collective into a
psum_scatter), so this is exactly global-batch contrastive training.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from construction_clip_tpu.core.mesh import DATA_AXIS


def _cross_entropy(logits, labels):
    """Mean CE over rows; logits fp32."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))


def local_infonce(img_feats, txt_feats, logit_scale):
    """Single-device symmetric InfoNCE — reference CLIP/train.py:161-166 semantics.

    Features must be L2-normalized. Returns (loss, logits_per_image).
    """
    logits = jnp.exp(logit_scale) * img_feats @ txt_feats.T
    labels = jnp.arange(logits.shape[0])
    loss = 0.5 * (_cross_entropy(logits, labels) + _cross_entropy(logits.T, labels))
    return loss, logits


def global_infonce(img_feats, txt_feats, logit_scale, *, axis_name: str = DATA_AXIS):
    """Global-batch symmetric InfoNCE inside shard_map/pjit over `axis_name`.

    img_feats/txt_feats: [local_B, E], L2-normalized, sharded over axis_name.
    Every chip computes CE of its local rows vs the all-gathered global columns;
    the mean over chips (psum / n) equals the global-batch loss.
    """
    n_dev = jax.lax.axis_size(axis_name)
    local_b = img_feats.shape[0]
    my_idx = jax.lax.axis_index(axis_name)

    # gather global features over ICI (tiled=True -> [global_B, E])
    all_txt = jax.lax.all_gather(txt_feats, axis_name, tiled=True)
    all_img = jax.lax.all_gather(img_feats, axis_name, tiled=True)

    scale = jnp.exp(logit_scale)
    # local rows vs global columns: [local_B, global_B]
    logits_i = scale * img_feats @ all_txt.T
    logits_t = scale * txt_feats @ all_img.T
    labels = my_idx * local_b + jnp.arange(local_b)

    loss = 0.5 * (_cross_entropy(logits_i, labels) + _cross_entropy(logits_t, labels))
    # mean over chips = global-batch mean (every chip contributes local_B rows)
    loss = jax.lax.pmean(loss, axis_name)
    acc = jnp.mean((jnp.argmax(logits_i, axis=-1) == labels).astype(jnp.float32))
    acc = jax.lax.pmean(acc, axis_name)
    return loss, acc

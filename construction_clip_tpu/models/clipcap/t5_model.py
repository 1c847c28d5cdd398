"""ClipCap mT5 variant: CLIP prefix injected into the T5 encoder states.

Reference (reference CLIP_prefix_caption/train_t5.py:222-287):
  - encoder runs over the caption tokens (input_ids), THEN the mapped CLIP prefix is
    concatenated in FRONT of the encoder hidden states (train_t5.py:229-233);
  - decoder_input_ids = [prefix_length zeros ‖ labels] (train_t5.py:241-245,269) — the
    dummy-token prefix aligns the loss slice, a pattern carried over from the GPT
    version;
  - loss = CE(logits[:, prefix_length-1 : -1] vs input_ids, ignore_index 0)
    (train_t5.py:357,371-372) — the caption is both encoder input and target
    (an autoencoding setup; reproduced as the behavioral contract);
  - generation samples from t5.generate(max_length 32) given the concatenated
    encoder states (test_t5.py:245-249) -> infer/decode_t5.py here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from construction_clip_tpu.core.configs import ClipCapConfig, T5Config
from construction_clip_tpu.core.precision import Policy, DEFAULT_POLICY
from construction_clip_tpu.models import t5 as t5_lib
from construction_clip_tpu.models.clipcap.model import init_mapper, map_prefix


class _GptShapeShim:
    """ClipCapConfig mappers are sized by an `n_embd` attribute; T5 uses d_model."""

    def __init__(self, d_model: int):
        self.n_embd = d_model


def init_clipcap_t5(key, ccfg: ClipCapConfig, tcfg: T5Config, dtype=jnp.float32,
                    t5_params=None):
    k1, k2 = jax.random.split(key)
    return {
        "mapper": init_mapper(k1, ccfg, _GptShapeShim(tcfg.d_model), dtype),
        "t5": t5_params if t5_params is not None else t5_lib.init_t5(k2, tcfg, dtype),
    }


def encode_with_prefix(params, ccfg: ClipCapConfig, tcfg: T5Config, *,
                       input_ids, attention_mask, clip_embed,
                       policy: Policy = DEFAULT_POLICY):
    """-> (encoder_hidden [B, prefix+T, d], full_mask [B, prefix+T])."""
    enc = t5_lib.t5_encode(params["t5"], tcfg, input_ids,
                           attention_mask=attention_mask, policy=policy)
    prefix = map_prefix(params["mapper"], ccfg, _GptShapeShim(tcfg.d_model),
                        clip_embed, policy=policy).astype(enc.dtype)
    hidden = jnp.concatenate([prefix, enc], axis=1)
    if attention_mask is None:
        attention_mask = jnp.ones(input_ids.shape, jnp.int32)
    full_mask = jnp.concatenate(
        [jnp.ones((input_ids.shape[0], ccfg.prefix_length), attention_mask.dtype),
         attention_mask], axis=1)
    return hidden, full_mask


def clipcap_t5_forward(params, ccfg: ClipCapConfig, tcfg: T5Config, *,
                       input_ids, attention_mask, clip_embed,
                       policy: Policy = DEFAULT_POLICY):
    """Training forward. decoder_input_ids = [prefix_len zeros ‖ input_ids] (the
    reference uses the collated labels here, which equal the caption tokens).
    Returns logits [B, prefix_len + T, V]."""
    hidden, full_mask = encode_with_prefix(
        params, ccfg, tcfg, input_ids=input_ids, attention_mask=attention_mask,
        clip_embed=clip_embed, policy=policy)
    b = input_ids.shape[0]
    dec_in = jnp.concatenate(
        [jnp.zeros((b, ccfg.prefix_length), input_ids.dtype), input_ids], axis=1)
    logits, _ = t5_lib.t5_decode(params["t5"], tcfg, dec_in, hidden,
                                 encoder_mask=full_mask, policy=policy)
    return logits


def t5_caption_loss_parts(logits, input_ids, ccfg: ClipCapConfig, *,
                          ignore_id: int = 0):
    """(sum of masked token NLL, valid-token count) — see
    clipcap.model.caption_loss_parts for why DP needs the pieces."""
    pred = logits[:, ccfg.prefix_length - 1: -1]
    logp = jax.nn.log_softmax(pred.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, input_ids[..., None], axis=-1)[..., 0]
    mask = (input_ids != ignore_id).astype(jnp.float32)
    return jnp.sum(nll * mask), jnp.sum(mask)


def t5_caption_loss(logits, input_ids, ccfg: ClipCapConfig, *, ignore_id: int = 0):
    """CE on logits[:, prefix_len-1:-1] vs input_ids, ignore 0
    (reference train_t5.py:357,371-372)."""
    total, count = t5_caption_loss_parts(logits, input_ids, ccfg,
                                         ignore_id=ignore_id)
    return total / jnp.maximum(count, 1.0)

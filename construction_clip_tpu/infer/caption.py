"""End-to-end caption prediction: image -> CLIP embed -> zero-shot attribute ->
mapper prefix -> GPT-2 decode -> text.

The reference's predict() (reference CLIP_prefix_caption/test.py:516-549, inlined
again in application.py:92-108 and predict.py:62-76): encode image, zero-shot the
attribute when none is given ('現況/缺失' + violation_type + ' ', test.py:523-534),
tokenize/pad the attribute to attribute_length (test.py:536-538), concat
[clip_project(prefix) ‖ wte(attribute)] and beam-search. Batched here: N images per
call, one jitted forward + one jitted decode for the whole batch.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from construction_clip_tpu.core.configs import CLIPConfig, ClipCapConfig, GPT2Config
from construction_clip_tpu.core.precision import Policy, DEFAULT_POLICY
from construction_clip_tpu.data.labels import (
    CAPTION_TYPE_PROMPTS, VIOLATION_TYPES, attribute_string)
from construction_clip_tpu.infer.decode import greedy_decode, beam_decode
from construction_clip_tpu.infer.precompute import make_embed_classify_fn
from construction_clip_tpu.models import gpt2 as gpt2_lib
from construction_clip_tpu.models.clipcap import map_prefix


@dataclasses.dataclass
class CaptionPipeline:
    clip_params: dict
    clip_cfg: CLIPConfig
    cap_params: dict          # {"mapper", "gpt"}
    ccfg: ClipCapConfig
    gcfg: GPT2Config
    clip_tokenizer: object    # ClipTokenizer (label prompts)
    lm_tokenizer: object      # BERT-style tokenizer (attribute + captions)
    policy: Policy = DEFAULT_POLICY
    stop_token: int = 102     # [SEP] in the BERT-chinese vocab
    max_steps: int = 100
    beam_size: int = 3
    temperature: float = 0.5

    def __post_init__(self):
        ctx = self.clip_cfg.text.context_length
        ct = self.clip_tokenizer.tokenize(list(CAPTION_TYPE_PROMPTS), ctx)
        vt = self.clip_tokenizer.tokenize(list(VIOLATION_TYPES), ctx)
        self._embed_classify = make_embed_classify_fn(
            self.clip_params, self.clip_cfg, ct, vt, policy=self.policy)
        # the zero-shot attribute can only take len(ct) x len(vt) = 18 values,
        # so its token rows are precomputed once and the per-batch attribute
        # lookup becomes a DEVICE gather — no mid-pipeline host sync (fetch
        # ct/vt -> format string -> tokenize -> H2D), which costs ~3 tunnel
        # round-trips per batch on the serving hot path (serve/app.py)
        rows = [self.attribute_tokens(
                    [attribute_string(c, v)])[0]
                for c in CAPTION_TYPE_PROMPTS for v in VIOLATION_TYPES]
        self._attr_table = jnp.asarray(np.stack(rows))

    # ---- pieces -----------------------------------------------------------

    def classify_and_embed(self, images):
        """preprocessed images [B,H,W,3] -> (clip_embeds [B,E], attributes [B] str)."""
        emb, ct, vt = self._embed_classify(images)
        attrs = [attribute_string(CAPTION_TYPE_PROMPTS[int(c)], VIOLATION_TYPES[int(v)])
                 for c, v in zip(np.asarray(ct), np.asarray(vt))]
        return emb, attrs

    def attribute_tokens(self, attributes: Sequence[str]) -> np.ndarray:
        out = np.zeros((len(attributes), self.ccfg.attribute_length), np.int32)
        for i, a in enumerate(attributes):
            ids = self.lm_tokenizer.encode(a)[: self.ccfg.attribute_length]
            out[i, : len(ids)] = ids
        return out

    def prompt_embeds(self, clip_embeds, attr_tokens):
        prefix = map_prefix(self.cap_params["mapper"], self.ccfg, self.gcfg,
                            clip_embeds, policy=self.policy)
        attr_emb = gpt2_lib.embed_tokens(self.cap_params["gpt"],
                                         jnp.asarray(attr_tokens), policy=self.policy)
        return jnp.concatenate([prefix.astype(attr_emb.dtype), attr_emb], axis=1)

    def decode_to_text(self, tokens: np.ndarray, lengths: np.ndarray) -> list[str]:
        out = []
        for row, n in zip(tokens, lengths):
            ids = [int(t) for t in row[: int(n)] if int(t) != self.stop_token]
            text = self.lm_tokenizer.decode(ids, skip_special_tokens=True)
            out.append(text.replace(" ", ""))  # BERT-zh decode inserts spaces
        return out

    # ---- end to end -------------------------------------------------------

    def caption_images(self, images, *, attributes: Optional[Sequence[str]] = None,
                       use_beam: bool = True):
        """images: preprocessed [B,H,W,3]. Returns list of dicts
        {caption, caption_type, violation_type, attribute}.

        The whole classify -> attribute -> prefix -> decode chain stays on
        device; the single host transfer is one packed [B, T+3] int32 fetch of
        (tokens, length, caption_type, violation_type) at the end.
        """
        emb, ct, vt = self._embed_classify(images)
        if attributes is None:
            attr_tok = self._attr_table[ct * len(VIOLATION_TYPES) + vt]
        else:
            attr_tok = jnp.asarray(self.attribute_tokens(list(attributes)))
        embeds = self.prompt_embeds(emb, attr_tok)
        if use_beam:
            res = beam_decode(self.cap_params["gpt"], self.gcfg, embeds,
                              beam_size=self.beam_size, max_steps=self.max_steps,
                              stop_token=self.stop_token,
                              temperature=self.temperature, policy=self.policy)
            toks_d, lens_d = res.tokens[:, 0], res.lengths[:, 0]  # best beam
        else:
            res = greedy_decode(self.cap_params["gpt"], self.gcfg, embeds,
                                max_steps=self.max_steps, stop_token=self.stop_token,
                                policy=self.policy)
            toks_d, lens_d = res.tokens, res.lengths
        if attributes is not None:
            # caller-supplied attributes: ct/vt never reach the output, so
            # don't transfer them
            packed = np.asarray(jnp.concatenate(
                [toks_d.astype(jnp.int32), lens_d[:, None].astype(jnp.int32)],
                axis=1))
            toks, lens = packed[:, :-1], packed[:, -1]
            attrs = list(attributes)
        else:
            packed = np.asarray(jnp.concatenate(
                [toks_d.astype(jnp.int32), lens_d[:, None].astype(jnp.int32),
                 ct[:, None].astype(jnp.int32), vt[:, None].astype(jnp.int32)],
                axis=1))
            toks, lens = packed[:, :-3], packed[:, -3]
            attrs = [attribute_string(CAPTION_TYPE_PROMPTS[int(c)],
                                      VIOLATION_TYPES[int(v)])
                     for c, v in zip(packed[:, -2], packed[:, -1])]
        captions = self.decode_to_text(toks, lens)
        # Decode-collapse guard (round 4): a TPU worker in a corrupted window
        # (observed after a backend kernel fault; tools/diag_beam_variants.py
        # ran the IDENTICAL program twice 15 min apart and got 8/8 then 0/8
        # real captions — the runs/e2e 162-empty-caption artifact was this)
        # returns garbage logits for SOME rows of a decode program: every step
        # argmaxes to token 0, so the row never stops and decodes to ''. A
        # real caption that hits max_steps still has non-[PAD] tokens and
        # decodes non-empty, so `empty AND length == max_steps` is a precise
        # collapse signature. Beam rows are retried with greedy in-process;
        # rows still collapsed after that are flagged `decode_suspect` so
        # callers (apps/predict.py) can re-run them after a backoff.
        suspect = {i for i, (c, n) in enumerate(zip(captions, lens))
                   if not c and int(n) >= self.max_steps}
        if use_beam and suspect:
            bad = sorted(suspect)
            logging.getLogger(__name__).warning(
                "beam decode collapsed on %d/%d rows (empty at max_steps);"
                " retrying those rows with greedy decode", len(bad),
                len(captions))
            # retry over the FULL batch: a bad-rows-only gather would give a
            # data-dependent shape (fresh compile per collapsed-row count);
            # the full-batch greedy is one stable program and ~3x cheaper
            # than the beam pass that already ran
            g = greedy_decode(self.cap_params["gpt"], self.gcfg,
                              embeds, max_steps=self.max_steps,
                              stop_token=self.stop_token,
                              policy=self.policy)
            gpacked = np.asarray(jnp.concatenate(
                [g.tokens.astype(jnp.int32),
                 g.lengths[:, None].astype(jnp.int32)], axis=1))
            gcaps = self.decode_to_text(gpacked[:, :-1], gpacked[:, -1])
            for i in bad:
                captions[i] = gcaps[i]
                if gcaps[i] or int(gpacked[i, -1]) < self.max_steps:
                    suspect.discard(i)
        if suspect:
            logging.getLogger(__name__).error(
                "%d/%d rows still collapsed after retry — the device is in a"
                " garbage window; rows are flagged decode_suspect",
                len(suspect), len(captions))
        out = []
        for i, (cap, attr) in enumerate(zip(captions, attrs)):
            parts = attr.split()
            ct_zh = parts[0] if parts else ""
            vt = parts[1] if len(parts) > 1 else ""
            out.append({
                "caption": cap,
                "attribute": attr,
                "caption_type": "status" if ct_zh == "現況" else "violation",
                "violation_type": vt,
                "decode_suspect": i in suspect,
            })
        return out

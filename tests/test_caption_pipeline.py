"""CaptionPipeline unit coverage (beyond the serving tests): auto vs explicit
attributes, beam vs greedy, decode_to_text; plus apps/common.load_clip npz path."""

import gzip
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from construction_clip_tpu.core.configs import (
    CLIPConfig, VisionConfig, TextConfig, ClipCapConfig, GPT2Config)
from construction_clip_tpu.models.clip import init_clip
from construction_clip_tpu.models.clipcap import init_clipcap
from construction_clip_tpu.infer.caption import CaptionPipeline

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TinyLMTok:
    def encode(self, text):
        return [ord(c) % 90 + 3 for c in text][:8]

    def decode(self, ids, skip_special_tokens=True):
        if skip_special_tokens:  # id 0 is [PAD], like the BERT-zh vocab
            ids = [i for i in ids if int(i) != 0]
        return " ".join(str(int(i)) for i in ids)


@pytest.fixture(scope="module")
def pipe(tmp_path_factory):
    clip_cfg = CLIPConfig(
        vision=VisionConfig(image_size=32, patch_size=8, width=32, layers=1,
                            heads=2, embed_dim=16),
        text=TextConfig(vocab_size=600, context_length=12, width=32, layers=1,
                        heads=2, embed_dim=16))
    gcfg = GPT2Config(vocab_size=120, n_positions=64, n_embd=32, n_layer=1, n_head=2)
    ccfg = ClipCapConfig(prefix_length=2, attribute_length=4, clip_dim=16)
    p = tmp_path_factory.mktemp("tok") / "m.txt.gz"
    with gzip.open(p, "wt", encoding="utf-8") as f:
        f.write("version\n")
    from construction_clip_tpu.data.clip_tokenizer import ClipTokenizer

    return CaptionPipeline(
        clip_params=init_clip(jax.random.key(0), clip_cfg), clip_cfg=clip_cfg,
        cap_params=init_clipcap(jax.random.key(1), ccfg, gcfg), ccfg=ccfg,
        gcfg=gcfg, clip_tokenizer=ClipTokenizer(str(p), n_merges=None),
        lm_tokenizer=TinyLMTok(), stop_token=119, max_steps=5, beam_size=2)


def test_auto_attributes(pipe, rng):
    from construction_clip_tpu.data.preprocess import preprocess_batch

    imgs = preprocess_batch((rng.random((3, 48, 48, 3)) * 255).astype(np.uint8), 32)
    out = pipe.caption_images(imgs, use_beam=False)
    assert len(out) == 3
    for o in out:
        assert o["caption_type"] in ("violation", "status")
        assert o["violation_type"] in ("墜落", "機械", "物料", "感電", "防護具",
                                       "穿刺", "爆炸", "工作場所", "搬運")
        assert o["attribute"].endswith(" ")


def test_explicit_attributes_and_beam(pipe, rng):
    from construction_clip_tpu.data.preprocess import preprocess_batch

    imgs = preprocess_batch((rng.random((2, 48, 48, 3)) * 255).astype(np.uint8), 32)
    out = pipe.caption_images(imgs, attributes=["缺失 墜落 ", "現況 機械 "],
                              use_beam=True)
    assert out[0]["caption_type"] == "violation"
    assert out[0]["violation_type"] == "墜落"
    assert out[1]["caption_type"] == "status"


def test_beam_collapse_guard_falls_back_to_greedy(pipe, rng, monkeypatch, caplog):
    """Collapsed beam rows (empty caption at exactly max_steps — the corrupted-
    TPU-worker signature, tools/diag_beam_variants.py) are retried with greedy."""
    import logging

    from construction_clip_tpu.data.preprocess import preprocess_batch
    from construction_clip_tpu.infer import caption as cap_mod
    from construction_clip_tpu.infer.decode import DecodeResult

    imgs = preprocess_batch((rng.random((2, 48, 48, 3)) * 255).astype(np.uint8), 32)
    attrs = ["缺失 墜落 ", "現況 機械 "]
    expected = pipe.caption_images(imgs, attributes=attrs, use_beam=False)

    def collapsed_beam(params, gcfg, embeds, **kw):
        b = embeds.shape[0]
        return DecodeResult(
            tokens=jnp.zeros((b, pipe.beam_size, pipe.max_steps), jnp.int32),
            lengths=jnp.full((b, pipe.beam_size), pipe.max_steps, jnp.int32),
            scores=jnp.zeros((b, pipe.beam_size)))

    monkeypatch.setattr(cap_mod, "beam_decode", collapsed_beam)
    with caplog.at_level(logging.WARNING):
        out = pipe.caption_images(imgs, attributes=attrs, use_beam=True)
    assert "collapsed" in caplog.text
    assert [o["caption"] for o in out] == [e["caption"] for e in expected]
    assert all(o["decode_suspect"] is False for o in out)


def test_collapse_flags_suspect_when_greedy_also_collapses(pipe, rng, monkeypatch):
    """Rows still collapsed after the greedy retry carry decode_suspect=True
    so apps/predict.py can re-run them after a backoff."""
    from construction_clip_tpu.data.preprocess import preprocess_batch
    from construction_clip_tpu.infer import caption as cap_mod
    from construction_clip_tpu.infer.decode import DecodeResult

    imgs = preprocess_batch((rng.random((2, 48, 48, 3)) * 255).astype(np.uint8), 32)

    def collapsed_beam(params, gcfg, embeds, **kw):
        b = embeds.shape[0]
        return DecodeResult(
            tokens=jnp.zeros((b, pipe.beam_size, pipe.max_steps), jnp.int32),
            lengths=jnp.full((b, pipe.beam_size), pipe.max_steps, jnp.int32),
            scores=jnp.zeros((b, pipe.beam_size)))

    def collapsed_greedy(params, gcfg, embeds, **kw):
        b = embeds.shape[0]
        return DecodeResult(tokens=jnp.zeros((b, pipe.max_steps), jnp.int32),
                            lengths=jnp.full((b,), pipe.max_steps, jnp.int32),
                            scores=jnp.zeros((b,)))

    monkeypatch.setattr(cap_mod, "beam_decode", collapsed_beam)
    monkeypatch.setattr(cap_mod, "greedy_decode", collapsed_greedy)
    out = pipe.caption_images(imgs, attributes=["缺失 墜落 ", "現況 機械 "],
                              use_beam=True)
    assert all(o["decode_suspect"] is True for o in out)
    assert all(o["caption"] == "" for o in out)


def test_decode_to_text_strips_stop_and_spaces(pipe):
    toks = np.asarray([[5, 7, 119, 0, 0]])
    out = pipe.decode_to_text(toks, np.asarray([3]))
    assert out == ["57"]  # stop token removed, tokenizer spaces squeezed


def test_load_clip_npz_roundtrip(tmp_path, monkeypatch):
    monkeypatch.syspath_prepend(os.path.join(REPO, "apps"))
    from common import load_clip

    from construction_clip_tpu.train.checkpoint import save_params_npz

    params, cfg = load_clip(None, arch="tiny")
    p = str(tmp_path / "clip.npz")
    save_params_npz(p, params)
    loaded, cfg2 = load_clip(p, arch="tiny")
    assert cfg2 == cfg
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

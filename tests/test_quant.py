"""int8 quantization ops + the int8 CLIP image-tower serving path (CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from construction_clip_tpu.core.configs import CLIPConfig
from construction_clip_tpu.models.clip import init_clip, encode_image
from construction_clip_tpu.models.clip.quant import encode_image_int8, quantize_clip
from construction_clip_tpu.ops.quant import int8_linear, quantize_weight


def test_quantize_weight_roundtrip(rng):
    w = jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32))
    q, s = quantize_weight(w)
    assert q.dtype == jnp.int8 and s.shape == (32,)
    deq = q.astype(np.float32) * np.asarray(s)
    err = np.abs(deq - np.asarray(w)).max()
    assert err <= np.abs(np.asarray(w)).max() / 127.0 + 1e-6


def test_int8_linear_close_to_fp(rng):
    x = jnp.asarray(rng.standard_normal((8, 64)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((32,)).astype(np.float32))
    q, s = quantize_weight(w)
    y = int8_linear(x, q, s, b)
    ref = x @ w + b
    rel = np.abs(np.asarray(y - ref)).max() / np.abs(np.asarray(ref)).max()
    assert rel < 0.03, rel


def test_zero_row_and_zero_col_safe():
    x = jnp.zeros((4, 16))
    w = jnp.zeros((16, 8)).at[:, :4].set(1.0)
    q, s = quantize_weight(w)
    y = int8_linear(x, q, s)
    assert np.isfinite(np.asarray(y)).all()
    np.testing.assert_array_equal(np.asarray(y), 0.0)


def test_int8_encode_matches_bf16(rng):
    cfg = CLIPConfig.tiny()
    params = init_clip(jax.random.key(0), cfg)
    images = jnp.asarray(
        rng.standard_normal((4, cfg.vision.image_size, cfg.vision.image_size, 3))
        .astype(np.float32))
    ref = np.asarray(encode_image(params, cfg, images, normalize=True),
                     dtype=np.float32)
    qp = quantize_clip(params)
    got = np.asarray(encode_image_int8(qp, cfg, images, normalize=True),
                     dtype=np.float32)
    cos = (ref * got).sum(-1)
    assert cos.min() > 0.98, cos  # int8 serving features track bf16/fp32


def test_int8_encode_vit_b_shapes(rng):
    """Full-size tower one forward on CPU — shape/dtype plumbing for the real
    config (small batch to keep it quick)."""
    cfg = CLIPConfig.vit_b_32()
    params = init_clip(jax.random.key(1), cfg)
    qp = quantize_clip(params)
    blocks = qp["vision"]["blocks"]
    assert blocks["mlp"]["w_fc"]["q"].dtype == jnp.int8
    assert blocks["mlp"]["w_fc"]["s"].shape == (cfg.vision.layers, 3072)
    assert blocks["attn"]["w_qkv"]["q"].dtype == jnp.int8
    assert blocks["attn"]["w_qkv"]["s"].shape == (cfg.vision.layers, 3 * 768)
    images = jnp.asarray(rng.standard_normal((2, 224, 224, 3)).astype(np.float32))
    feats = encode_image_int8(qp, cfg, images, normalize=True)
    assert feats.shape == (2, cfg.vision.embed_dim)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(feats, np.float32), axis=-1), 1.0, rtol=2e-2)


def test_int8_fused_kernel_matches_xla_path(rng, monkeypatch):
    """The int8 Pallas attention block (interpret mode) vs the composable
    int8_linear math in models/clip/quant._attn_residual_q."""
    import functools

    from jax.experimental import pallas as pl

    from construction_clip_tpu.models.blocks import init_block
    from construction_clip_tpu.models.clip.quant import _attn_residual_q
    from construction_clip_tpu.ops import pallas_attention_block_int8 as fab8
    from construction_clip_tpu.ops.quant import quantize_tree

    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call", functools.partial(orig, interpret=True))

    D, H = 64, 4
    params = init_block(jax.random.key(0), D)
    qattn = quantize_tree({"a": params["attn"]},
                          [("a", "w_qkv"), ("a", "w_out")])["a"]
    x = jnp.asarray(rng.standard_normal((4, 12, D)).astype(np.float32))
    got = fab8.fused_attention_block_int8(x, params["ln_1"], qattn, n_heads=H)
    # force the composable int8_linear path for the reference value
    monkeypatch.setattr(fab8, "supported", lambda *a: False)
    ref = _attn_residual_q(x, params["ln_1"], qattn, H)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_quantized_gpt2_decode(rng):
    """Weight-only int8 GPT-2: cached greedy decode runs and logits track the
    float path closely on realistic-scale weights."""
    from construction_clip_tpu.core.configs import GPT2Config
    from construction_clip_tpu.infer.decode import greedy_decode
    from construction_clip_tpu.models.gpt2 import gpt2_forward, init_gpt2, quantize_gpt2

    cfg = GPT2Config(n_layer=2, n_embd=64, n_head=4, vocab_size=128, n_positions=64)
    params = init_gpt2(jax.random.key(0), cfg)
    qp = quantize_gpt2(params, dtype=jnp.float32)
    emb = jnp.asarray(rng.standard_normal((2, 5, 64)).astype(np.float32)) * 0.05

    lf, _ = gpt2_forward(params, cfg, inputs_embeds=emb)
    lq, _ = gpt2_forward(qp, cfg, inputs_embeds=emb)
    a, b = np.asarray(lf), np.asarray(lq)
    cos = (a * b).sum(-1) / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))
    assert cos.min() > 0.999, cos.min()

    out = greedy_decode(qp, cfg, emb, max_steps=8, stop_token=127)
    toks = np.asarray(out.tokens if hasattr(out, "tokens") else out)
    assert toks.shape == (2, 8)


def test_int8_caption_pipeline_end_to_end(rng):
    """Quantized CLIP + quantized GPT-2 through the full serving pipeline
    (classify -> attribute -> prefix -> decode -> text) on tiny configs."""
    import gzip
    import tempfile

    from construction_clip_tpu.core.configs import (ClipCapConfig, GPT2Config,
                                                    TextConfig, VisionConfig)
    from construction_clip_tpu.core.configs import CLIPConfig as CC
    from construction_clip_tpu.data.clip_tokenizer import ClipTokenizer
    from construction_clip_tpu.infer.caption import CaptionPipeline
    from construction_clip_tpu.models.clip.quant import quantize_clip
    from construction_clip_tpu.models.clipcap import init_clipcap
    from construction_clip_tpu.models.gpt2 import quantize_gpt2

    clip_cfg = CC(
        vision=VisionConfig(image_size=32, patch_size=8, width=32, layers=1,
                            heads=2, embed_dim=16),
        text=TextConfig(vocab_size=600, context_length=12, width=32, layers=1,
                        heads=2, embed_dim=16))
    gcfg = GPT2Config(vocab_size=128, n_positions=64, n_embd=32, n_layer=1,
                      n_head=2)
    ccfg = ClipCapConfig(prefix_length=2, attribute_length=3, clip_dim=16)
    with tempfile.NamedTemporaryFile(suffix=".txt.gz", delete=False) as f:
        pass
    with gzip.open(f.name, "wt", encoding="utf-8") as g:
        g.write("version\n")

    class Tok:
        def encode(self, text):
            return [ord(c) % 100 + 5 for c in text][:6]

        def decode(self, ids, skip_special_tokens=True):
            return "".join(chr(0x4E00 + int(i) % 50) for i in ids)

    cap = init_clipcap(jax.random.key(1), ccfg, gcfg)
    pipe = CaptionPipeline(
        clip_params=quantize_clip(init_clip(jax.random.key(0), clip_cfg)),
        clip_cfg=clip_cfg,
        cap_params=dict(cap, gpt=quantize_gpt2(cap["gpt"])),
        ccfg=ccfg, gcfg=gcfg,
        clip_tokenizer=ClipTokenizer(f.name, n_merges=None),
        lm_tokenizer=Tok(), stop_token=102, max_steps=4, beam_size=2)
    imgs = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    for use_beam in (False, True):
        out = pipe.caption_images(imgs, use_beam=use_beam)
        assert len(out) == 2
        assert all(isinstance(o["caption"], str) for o in out)
        assert all(o["violation_type"] for o in out)

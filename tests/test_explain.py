"""Explainability: the probs_probe differentiation port must equal autograd through
actual attention probabilities (verified vs torch), and relevance propagation must
match an independent numpy implementation of the reference recurrence."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from construction_clip_tpu.core.configs import CLIPConfig, VisionConfig, TextConfig
from construction_clip_tpu.models.clip import init_clip, encode_image
from construction_clip_tpu.infer.explain import (
    interpret, _propagate, image_relevance_map, text_relevance_scores, overlay_heatmap)

CFG = CLIPConfig(
    vision=VisionConfig(image_size=16, patch_size=4, width=32, layers=3, heads=2, embed_dim=16),
    text=TextConfig(vocab_size=64, context_length=8, width=32, layers=2, heads=2, embed_dim=16),
)


@pytest.fixture(scope="module")
def setup(rng=np.random.default_rng(11)):
    params = init_clip(jax.random.key(2), CFG)
    images = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), dtype=jnp.float32)
    tokens = np.zeros((2, 8), np.int32)
    tokens[:, 0] = 62
    tokens[0, 1:4] = [5, 9, 63]   # EOT (max id) at pos 3
    tokens[1, 1:3] = [7, 63]      # EOT at pos 2
    return params, images, jnp.asarray(tokens)


def test_probe_grad_is_probs_grad(setup):
    """grad wrt the probe must equal d(sum of image feature)/d(attn probs):
    check via finite differences on one probe element."""
    params, images, _ = setup
    v = CFG.vision
    shape = (v.layers, 2, v.heads, v.seq_len, v.seq_len)

    def f(probe):
        feats = encode_image(params, CFG, images, probs_probe=probe)
        return jnp.sum(feats * 0.01)

    g = jax.grad(f)(jnp.zeros(shape, jnp.float32))
    # finite difference at a handful of positions
    eps = 1e-3
    rng = np.random.default_rng(0)
    for _ in range(4):
        idx = tuple(rng.integers(0, s) for s in shape)
        probe = jnp.zeros(shape, jnp.float32).at[idx].set(eps)
        fd = (float(f(probe)) - float(f(-probe))) / (2 * eps)
        np.testing.assert_allclose(float(g[idx]), fd, rtol=2e-2, atol=1e-5)


def test_propagate_matches_numpy_reference(rng):
    """R recurrence: R = I; per layer from start: R += clamp(grad*probs,0).mean(H) @ R;
    return R - I (reference attention.py:28-45)."""
    L, B, H, T = 3, 2, 2, 5
    probs = rng.random((L, B, H, T, T)).astype(np.float32)
    grads = rng.standard_normal((L, B, H, T, T)).astype(np.float32)

    for start_layer in (-1, 0, 1):
        start = start_layer % L
        expect = np.zeros((B, T, T), np.float32)
        for b in range(B):
            R = np.eye(T, dtype=np.float32)
            for l in range(L):
                if l < start:
                    continue
                cam = np.clip(grads[l, b] * probs[l, b], 0, None).mean(axis=0)
                R = R + cam @ R
            expect[b] = R - np.eye(T, dtype=np.float32)
        got = np.asarray(_propagate(jnp.asarray(probs), jnp.asarray(grads), start_layer))
        np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)


def test_interpret_end_to_end(setup):
    params, images, tokens = setup
    R_text, R_image = interpret(params, CFG, images, tokens)
    assert R_image.shape == (2, CFG.vision.seq_len, CFG.vision.seq_len)
    assert R_text.shape == (2, 8, 8)
    assert np.isfinite(np.asarray(R_image)).all()

    # visualization helpers
    heat = image_relevance_map(np.asarray(R_image)[0, 0], CFG.vision.grid, out_size=16)
    assert heat.shape == (16, 16) and 0 <= heat.min() and heat.max() <= 1

    scores = text_relevance_scores(np.asarray(R_text)[0], np.asarray(tokens)[0], 3)
    assert scores.shape == (8,)
    assert scores[:4].max() == 1.0

    img = (np.random.default_rng(0).random((16, 16, 3)) * 255).astype(np.uint8)
    overlay = overlay_heatmap(img, heat)
    assert overlay.shape == (16, 16, 3) and overlay.dtype == np.uint8


def test_text_heatmap_per_char(setup, tmp_path):
    """Per-char grouping of BPE-token relevance (reference attention.py:113-133):
    EOT-row scores over cols 1..EOT-1 normalized to sum 1, summed per source char;
    and the HTML renderer emits a file with one <mark> per char."""
    import os

    from construction_clip_tpu.infer.explain import (
        text_heatmap_per_char, render_text_heatmap_html)

    params, images, tokens = setup
    R_text, _ = interpret(params, CFG, images, tokens)

    class OneTokenPerChar:
        def encode(self, ch):
            return [1]

    # row 0: EOT at pos 3 -> cols 1..2 are scored -> 2 chars coverable
    char_scores = text_heatmap_per_char(np.asarray(R_text)[0],
                                        np.asarray(tokens)[0], "安全",
                                        OneTokenPerChar())
    assert len(char_scores) == 2
    total = sum(s for _, s in char_scores)
    np.testing.assert_allclose(total, 1.0, rtol=1e-5)

    class TwoTokensPerChar:
        def encode(self, ch):
            return [1, 2]

    # 2 BPE tokens per char -> both scores collapse onto ONE char
    grouped = text_heatmap_per_char(np.asarray(R_text)[0], np.asarray(tokens)[0],
                                    "安全", TwoTokensPerChar())
    assert len(grouped) == 1
    np.testing.assert_allclose(grouped[0][1], total, rtol=1e-5)

    out = str(tmp_path / "text_heat.html")
    html = render_text_heatmap_html(char_scores, out, title="安全")
    assert os.path.getsize(out) > 100
    assert html.count("<mark") == 2 and "安" in html


def test_decoder_attention_map(rng, tmp_path):
    """Post-hoc attention rows equal the reference's per-step last-layer capture
    (causality makes them identical); rows are softmax-normalized over the past."""
    from construction_clip_tpu.core.configs import GPT2Config
    from construction_clip_tpu.models.gpt2 import init_gpt2, embed_tokens, gpt2_forward
    from construction_clip_tpu.infer.explain import (
        decoder_attention_map, plot_attention_map)

    gcfg = GPT2Config.tiny()
    params = init_gpt2(jax.random.key(1), gcfg)
    prompt = embed_tokens(params, jnp.arange(4, dtype=jnp.int32)[None])
    gen = jnp.asarray([[7, 9, 11]], dtype=jnp.int32)
    rows = decoder_attention_map(params, gcfg, prompt, gen)
    assert rows.shape == (3, 7)
    # each row sums to 1 over its visible prefix; future positions are ~0
    np.testing.assert_allclose(rows.sum(-1), np.ones(3), rtol=1e-5)
    assert rows[0, 5] < 1e-6 and rows[0, 6] < 1e-6  # can't attend to the future

    # per-step equivalence: step i's row == forward over [prompt ‖ gen[:i]] last row
    _, probs = gpt2_forward(
        params, gcfg,
        inputs_embeds=jnp.concatenate(
            [prompt, embed_tokens(params, gen[:, :1])], axis=1),
        return_probs=True)
    step0 = np.asarray(probs[-1][0].mean(0)[-1][:7])
    padded = np.zeros(7)
    padded[:5] = step0[:5]
    np.testing.assert_allclose(rows[1][:5], padded[:5], rtol=1e-4, atol=1e-5)

    out = str(tmp_path / "attn.png")
    plot_attention_map(rows, out, token_labels=["a", "b", "c"])
    import os

    assert os.path.getsize(out) > 1000

"""Golden regression pins: fixed-seed tiny-model outputs stored in tests/goldens/.

These protect refactors across build rounds: any numerics change in the CLIP towers,
GPT-2, the decode loop, or preprocessing shows up as a golden diff (regenerate
deliberately with REGEN_GOLDENS=1 when a change is intended).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")
REGEN = os.environ.get("REGEN_GOLDENS") == "1"


def check(name, arrays: dict, rtol=1e-5, atol=1e-6):
    path = os.path.join(GOLDEN_DIR, name + ".npz")
    if REGEN or not os.path.exists(path):
        np.savez(path, **arrays)
        if not REGEN:
            pytest.skip(f"golden {name} created; rerun to compare")
    data = np.load(path)
    for k, v in arrays.items():
        np.testing.assert_allclose(np.asarray(v), data[k], rtol=rtol, atol=atol,
                                   err_msg=f"{name}/{k} drifted from golden")


def test_clip_golden(rng):
    from construction_clip_tpu.core.configs import CLIPConfig
    from construction_clip_tpu.models.clip import init_clip, clip_forward

    cfg = CLIPConfig.tiny()
    params = init_clip(jax.random.key(42), cfg)
    imgs = jnp.asarray(np.random.default_rng(42).standard_normal((2, 32, 32, 3)),
                       dtype=jnp.float32)
    toks = jnp.zeros((2, 16), jnp.int32).at[:, 0].set(254).at[:, 1].set(255)
    li, lt = clip_forward(params, cfg, imgs, toks)
    check("clip_tiny", {"logits_per_image": li})


def test_gpt2_decode_golden():
    from construction_clip_tpu.core.configs import GPT2Config
    from construction_clip_tpu.models.gpt2 import init_gpt2, embed_tokens
    from construction_clip_tpu.infer.decode import greedy_decode, beam_decode

    gcfg = GPT2Config.tiny()
    params = init_gpt2(jax.random.key(7), gcfg)
    embeds = embed_tokens(params, jnp.arange(6, dtype=jnp.int32)[None])
    g = greedy_decode(params, gcfg, embeds, max_steps=12, stop_token=5)
    b = beam_decode(params, gcfg, embeds, beam_size=3, max_steps=12, stop_token=5,
                    temperature=0.5)
    check("gpt2_decode_tiny", {
        "greedy_tokens": g.tokens, "beam_tokens": b.tokens, "beam_scores": b.scores})


def test_preprocess_golden():
    from construction_clip_tpu.data.preprocess import preprocess_batch

    yy, xx = np.mgrid[0:60, 0:80]
    img = np.stack([xx % 256, yy % 256, (xx * yy) % 256], -1).astype(np.uint8)
    out = preprocess_batch(img[None], 32)
    check("preprocess", {"out": out})


def test_t5_golden():
    from construction_clip_tpu.core.configs import T5Config
    from construction_clip_tpu.models.t5 import init_t5, t5_forward

    tcfg = T5Config.tiny()
    params = init_t5(jax.random.key(3), tcfg)
    ids = jnp.arange(2, 8, dtype=jnp.int32)[None]
    dec = jnp.arange(1, 5, dtype=jnp.int32)[None]
    logits, _ = t5_forward(params, tcfg, input_ids=ids, decoder_input_ids=dec)
    check("t5_tiny", {"logits": logits[:, :, :32]})


def test_detection_golden(rng):
    from construction_clip_tpu.models.detection import init_fasterrcnn, fasterrcnn_infer

    params = init_fasterrcnn(jax.random.key(11), num_classes=8)
    img = jnp.asarray(np.random.default_rng(11).random((128, 128, 3)).astype(np.float32))
    det = fasterrcnn_infer(params, img, image_size=128, pre_nms_topk=50,
                           post_nms_topk=20, detections_per_img=5)
    # box coords are in pixels downstream of a deep fp32 conv chain; XLA-CPU
    # thread-pool scheduling drifts reduction order ~1e-5 rel between runs on
    # this host, so pin to pixel-appropriate tolerance rather than 1e-5 rel
    check("detection_tiny", {"boxes": det.boxes, "scores": det.scores,
                             "labels": det.labels.astype(np.int32)},
          rtol=1e-4, atol=1e-3)


def test_lstm_captioner_golden():
    from construction_clip_tpu.models.lstm_captioner import (
        init_lstm_captioner, generate_caption)

    params = init_lstm_captioner(jax.random.key(13), vocab_size=30, embed_size=8,
                                 attention_dim=8, encoder_dim=12, decoder_dim=10)
    feats = jax.random.normal(jax.random.key(14), (1, 6, 12))
    toks, lengths, alphas = generate_caption(params, feats, sos_id=1, eos_id=2,
                                             max_len=8)
    check("lstm_tiny", {"tokens": toks, "alphas": alphas})


def test_t5_generate_golden():
    from construction_clip_tpu.core.configs import T5Config
    from construction_clip_tpu.models.t5 import init_t5, t5_encode
    from construction_clip_tpu.infer.decode_t5 import t5_generate

    tcfg = T5Config.tiny()
    params = init_t5(jax.random.key(17), tcfg)
    enc = t5_encode(params, tcfg, jnp.arange(2, 8, dtype=jnp.int32)[None])
    res = t5_generate(params, tcfg, enc, key=jax.random.key(18), max_steps=8,
                      do_sample=True, top_p=0.9)
    check("t5_generate_tiny", {"tokens": res.tokens})

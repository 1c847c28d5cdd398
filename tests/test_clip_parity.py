"""Numerical parity of our JAX CLIP vs torch (HF CLIPModel, quick_gelu, random init).

The reference's CLIP forward contract is `model(image, text) -> logits_per_image,
logits_per_text` (reference CLIP/train.py:161). We instantiate an HF CLIPModel offline
from config (no downloads), convert its random weights through our HF converter, and
require feature/logit agreement to fp32 tolerance.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from construction_clip_tpu.core.configs import CLIPConfig, VisionConfig, TextConfig
from construction_clip_tpu.models.clip import encode_image, encode_text
from construction_clip_tpu.models.clip.convert import from_hf_state_dict


def make_pair():
    cfg = CLIPConfig(
        vision=VisionConfig(image_size=32, patch_size=8, width=64, layers=2, heads=2, embed_dim=32),
        text=TextConfig(vocab_size=256, context_length=16, width=32, layers=2, heads=2, embed_dim=32),
    )
    hf_cfg = transformers.CLIPConfig(
        vision_config=dict(image_size=32, patch_size=8, hidden_size=64,
                           num_hidden_layers=2, num_attention_heads=2,
                           intermediate_size=256, hidden_act="quick_gelu",
                           projection_dim=32),
        text_config=dict(vocab_size=256, hidden_size=32, num_hidden_layers=2,
                         num_attention_heads=2, intermediate_size=128,
                         max_position_embeddings=16, hidden_act="quick_gelu",
                         projection_dim=32),
        projection_dim=32,
    )
    torch.manual_seed(0)
    hf = transformers.CLIPModel(hf_cfg).eval()
    params = from_hf_state_dict(hf.state_dict(), cfg)
    return cfg, hf, params


@pytest.fixture(scope="module")
def pair():
    return make_pair()


def test_image_features_match(pair, rng):
    cfg, hf, params = pair
    imgs = rng.standard_normal((3, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = hf.get_image_features(pixel_values=torch.from_numpy(imgs).permute(0, 3, 1, 2))
    ours = encode_image(params, cfg, jnp.asarray(imgs))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=2e-4, atol=2e-5)


def test_text_features_match(pair, rng):
    cfg, hf, params = pair
    # tokens shaped like CLIP usage: SOT, body, EOT (=max id) then padding zeros.
    B, T = 4, 16
    toks = np.zeros((B, T), dtype=np.int64)
    for b in range(B):
        n = 5 + b
        toks[b, 0] = 254  # SOT-like
        toks[b, 1:n] = rng.integers(3, 200, size=n - 1)
        toks[b, n] = 255  # EOT = max id -> argmax pooling position
    with torch.no_grad():
        out = hf.text_model(input_ids=torch.from_numpy(toks), output_hidden_states=False)
        hidden = out.last_hidden_state
        eot = torch.from_numpy(toks).argmax(dim=-1)
        pooled = hidden[torch.arange(B), eot]
        ref = pooled @ hf.text_projection.weight.T
    ours = encode_text(params, cfg, jnp.asarray(toks.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=2e-4, atol=2e-5)


def test_logits_match(pair, rng):
    cfg, hf, params = pair
    imgs = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    toks = np.zeros((3, 16), dtype=np.int64)
    for b in range(3):
        toks[b, 0] = 254
        toks[b, 1:4] = rng.integers(3, 200, size=3)
        toks[b, 4] = 255
    with torch.no_grad():
        img_f = hf.get_image_features(pixel_values=torch.from_numpy(imgs).permute(0, 3, 1, 2))
        out = hf.text_model(input_ids=torch.from_numpy(toks))
        pooled = out.last_hidden_state[torch.arange(3), torch.from_numpy(toks).argmax(dim=-1)]
        txt_f = pooled @ hf.text_projection.weight.T
        img_f = img_f / img_f.norm(dim=-1, keepdim=True)
        txt_f = txt_f / txt_f.norm(dim=-1, keepdim=True)
        ref_logits = hf.logit_scale.exp() * img_f @ txt_f.T

    from construction_clip_tpu.models.clip import clip_forward

    lpi, lpt = clip_forward(params, cfg, jnp.asarray(imgs), jnp.asarray(toks.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(lpi), ref_logits.numpy(), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(lpt), ref_logits.numpy().T, rtol=2e-4, atol=2e-4)


def test_openai_layout_roundtrip(pair, rng):
    """The OpenAI-format converter must agree with the HF-format converter when fed
    the same tensors renamed into OpenAI layout."""
    cfg, hf, params_hf = pair
    sd = hf.state_dict()

    def t(x):
        return x.detach().numpy()

    openai_sd = {
        "visual.conv1.weight": t(sd["vision_model.embeddings.patch_embedding.weight"]),
        "visual.class_embedding": t(sd["vision_model.embeddings.class_embedding"]),
        "visual.positional_embedding": t(sd["vision_model.embeddings.position_embedding.weight"]),
        "visual.ln_pre.weight": t(sd["vision_model.pre_layrnorm.weight"]),
        "visual.ln_pre.bias": t(sd["vision_model.pre_layrnorm.bias"]),
        "visual.ln_post.weight": t(sd["vision_model.post_layernorm.weight"]),
        "visual.ln_post.bias": t(sd["vision_model.post_layernorm.bias"]),
        "visual.proj": t(sd["visual_projection.weight"]).T,
        "token_embedding.weight": t(sd["text_model.embeddings.token_embedding.weight"]),
        "positional_embedding": t(sd["text_model.embeddings.position_embedding.weight"]),
        "ln_final.weight": t(sd["text_model.final_layer_norm.weight"]),
        "ln_final.bias": t(sd["text_model.final_layer_norm.bias"]),
        "text_projection": t(sd["text_projection.weight"]).T,
        "logit_scale": t(sd["logit_scale"]),
    }
    for tower, hf_prefix, oa_prefix, n in [
        ("v", "vision_model.encoder.layers", "visual.transformer.resblocks", cfg.vision.layers),
        ("t", "text_model.encoder.layers", "transformer.resblocks", cfg.text.layers),
    ]:
        for i in range(n):
            hp, op = f"{hf_prefix}.{i}", f"{oa_prefix}.{i}"
            wq, wk, wv = (t(sd[f"{hp}.self_attn.{x}_proj.weight"]) for x in "qkv")
            bq, bk, bv = (t(sd[f"{hp}.self_attn.{x}_proj.bias"]) for x in "qkv")
            openai_sd[f"{op}.attn.in_proj_weight"] = np.concatenate([wq, wk, wv], 0)
            openai_sd[f"{op}.attn.in_proj_bias"] = np.concatenate([bq, bk, bv])
            openai_sd[f"{op}.attn.out_proj.weight"] = t(sd[f"{hp}.self_attn.out_proj.weight"])
            openai_sd[f"{op}.attn.out_proj.bias"] = t(sd[f"{hp}.self_attn.out_proj.bias"])
            for ln_ours, ln_hf in [("ln_1", "layer_norm1"), ("ln_2", "layer_norm2")]:
                openai_sd[f"{op}.{ln_ours}.weight"] = t(sd[f"{hp}.{ln_hf}.weight"])
                openai_sd[f"{op}.{ln_ours}.bias"] = t(sd[f"{hp}.{ln_hf}.bias"])
            openai_sd[f"{op}.mlp.c_fc.weight"] = t(sd[f"{hp}.mlp.fc1.weight"])
            openai_sd[f"{op}.mlp.c_fc.bias"] = t(sd[f"{hp}.mlp.fc1.bias"])
            openai_sd[f"{op}.mlp.c_proj.weight"] = t(sd[f"{hp}.mlp.fc2.weight"])
            openai_sd[f"{op}.mlp.c_proj.bias"] = t(sd[f"{hp}.mlp.fc2.bias"])

    from construction_clip_tpu.models.clip.convert import (
        from_openai_state_dict, config_from_openai_state_dict)

    inferred = config_from_openai_state_dict(openai_sd)
    assert inferred.vision.width == cfg.vision.width
    assert inferred.vision.layers == cfg.vision.layers
    assert inferred.text.context_length == cfg.text.context_length
    params_oa, _ = from_openai_state_dict(openai_sd, cfg)

    import jax

    for a, b in zip(jax.tree.leaves(params_oa), jax.tree.leaves(params_hf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_other_arch_configs_forward():
    """ViT-B/16 and ViT-L/14 config paths produce correctly-shaped features."""
    import jax

    from construction_clip_tpu.core.configs import CLIPConfig

    for cfg, n_patches in ((CLIPConfig.vit_b_16(), 196), (CLIPConfig.vit_l_14(), 256)):
        assert cfg.vision.seq_len == n_patches + 1
        # tiny-ified forward check via structural init only (full-scale forward is
        # covered on TPU); init shapes must match config
        from construction_clip_tpu.models.clip import init_clip

        params = init_clip(jax.random.key(0), cfg)
        assert params["vision"]["pos_emb"].shape[0] == cfg.vision.seq_len
        assert params["vision"]["proj"].shape == (cfg.vision.width, cfg.vision.embed_dim)
        assert params["text"]["blocks"]["attn"]["w_qkv"].shape == (
            cfg.text.layers, cfg.text.width, 3 * cfg.text.width)

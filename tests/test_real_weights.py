"""Real-weight golden hook (VERDICT round 1, "keep the hook ready").

These tests run ONLY when a pretrained checkpoint is present (offline image ships
none): point CCTPU_CLIP_CKPT at an OpenAI/HF CLIP .pt state dict and
CCTPU_BPE_VOCAB at bpe_simple_vocab_16e6.txt.gz. They pin the invariants that
silently break real-weight parity: tokenizer/vocab alignment (SOT/EOT ids vs the
text tower's vocab), converter shape coverage, and unit-norm encode features.
"""

import os

import numpy as np
import pytest

CKPT = os.environ.get("CCTPU_CLIP_CKPT", "/root/weights/clip_vit_b_32.pt")
VOCAB = os.environ.get("CCTPU_BPE_VOCAB", "/root/weights/bpe_simple_vocab_16e6.txt.gz")

needs_ckpt = pytest.mark.skipif(not os.path.exists(CKPT),
                                reason=f"no CLIP checkpoint at {CKPT}")
needs_vocab = pytest.mark.skipif(not os.path.exists(VOCAB),
                                 reason=f"no BPE vocab at {VOCAB}")


@needs_vocab
def test_pretrained_tokenizer_special_ids():
    from construction_clip_tpu.data.clip_tokenizer import ClipTokenizer

    tok = ClipTokenizer(VOCAB)  # default n_merges must build the 49408 vocab
    assert tok.vocab_size == 49408
    assert tok.sot_token == 49406 and tok.eot_token == 49407


@needs_ckpt
@needs_vocab
def test_real_weight_encode_end_to_end():
    import jax.numpy as jnp

    from construction_clip_tpu.core.configs import CLIPConfig
    from construction_clip_tpu.data.clip_tokenizer import ClipTokenizer
    from construction_clip_tpu.models.clip import encode_image, encode_text
    from construction_clip_tpu.models.clip.convert import (
        from_openai_state_dict, load_torch_checkpoint)

    cfg = CLIPConfig.vit_b_32()
    params = from_openai_state_dict(load_torch_checkpoint(CKPT), cfg)
    tok = ClipTokenizer(VOCAB)
    assert tok.vocab_size == cfg.text.vocab_size

    tokens = jnp.asarray(tok.tokenize(["a photo of a construction site",
                                       "a photo of a cat"]))
    txt = encode_text(params, cfg, tokens, normalize=True)
    img = encode_image(params, cfg, jnp.zeros((1, 224, 224, 3)), normalize=True)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(txt), axis=-1), 1.0,
                               rtol=1e-4)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(img), axis=-1), 1.0,
                               rtol=1e-4)
    # distinct prompts must not collapse
    assert float(np.asarray(txt[0] @ txt[1])) < 0.99

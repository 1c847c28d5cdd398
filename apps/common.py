"""Shared CLI plumbing: model/tokenizer loading, corpus paths, compilation cache."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def enable_compilation_cache():
    import jax

    if jax.default_backend() != "tpu":
        # CPU AOT cache entries embed machine features and can SIGILL when the
        # compile and execute hosts differ — cache only TPU programs.
        return
    cache_dir = os.environ.get("CCTPU_COMPILE_CACHE",
                               os.path.expanduser("~/.cache/cctpu_xla"))
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def load_clip(checkpoint: str | None, *, arch: str = "vit_b_32"):
    """Returns (params, cfg). checkpoint: None -> random init; .pt (OpenAI or HF or
    fine-tuned state dict) or .npz (ours)."""
    import jax

    from construction_clip_tpu.core.configs import CLIPConfig
    from construction_clip_tpu.models.clip import init_clip
    from construction_clip_tpu.models.clip import convert

    cfg = getattr(CLIPConfig, arch)()
    if checkpoint is None:
        return init_clip(jax.random.key(0), cfg), cfg
    if checkpoint.endswith(".npz"):
        from construction_clip_tpu.train.checkpoint import load_params_npz

        template = init_clip(jax.random.key(0), cfg)
        return load_params_npz(checkpoint, template), cfg
    sd = convert.load_torch_checkpoint(checkpoint)
    if any(k.startswith("visual.") for k in sd):
        params, cfg = convert.from_openai_state_dict(sd)
    else:
        params = convert.from_hf_state_dict(sd, cfg)
    return params, cfg


def load_clip_tokenizer(merges_path: str | None, *, expect_vocab: int | None = None):
    """CLIP BPE tokenizer; merges_path None -> look in standard spots.

    expect_vocab (pass cfg.text.vocab_size when pairing with pretrained weights)
    guards against a merges/vocab mismatch: encode_text pools at the EOT position,
    so an off-by-one vocabulary silently reads the wrong embedding rows.
    """
    from construction_clip_tpu.data.clip_tokenizer import ClipTokenizer

    candidates = [merges_path] if merges_path else []
    candidates += [os.path.expanduser("~/.cache/clip/bpe_simple_vocab_16e6.txt.gz"),
                   "bpe_simple_vocab_16e6.txt.gz"]
    for c in candidates:
        if c and os.path.exists(c):
            tok = ClipTokenizer(c)
            if expect_vocab is not None and tok.vocab_size != expect_vocab:
                raise ValueError(
                    f"tokenizer vocab {tok.vocab_size} != model text vocab "
                    f"{expect_vocab} (merges file {c}): text encodings would "
                    "misalign with the pretrained embedding table")
            return tok
    raise FileNotFoundError(
        "CLIP BPE merges file not found; pass --clip_bpe /path/to/"
        "bpe_simple_vocab_16e6.txt.gz (ships with OpenAI CLIP)")


def load_hf_tokenizer(name_or_path: str):
    """BERT-style tokenizer for the Chinese GPT-2 (reference uses
    ckiplab/gpt2-base-chinese = bert-base-chinese vocab). Works offline from a local
    vocab.txt/tokenizer.json path; falls back to HF hub name when online."""
    if os.path.isdir(name_or_path) or os.path.exists(name_or_path):
        from tokenizers import Tokenizer

        if name_or_path.endswith(".json"):
            return HFTokenizerShim(Tokenizer.from_file(name_or_path))
        vocab_txt = name_or_path if name_or_path.endswith("vocab.txt") else \
            os.path.join(name_or_path, "vocab.txt")
        if os.path.exists(vocab_txt):
            from tokenizers import BertWordPieceTokenizer

            return HFTokenizerShim(BertWordPieceTokenizer(vocab_txt))
    from transformers import AutoTokenizer

    return AutoTokenizer.from_pretrained(name_or_path)


def stream_corpus(annotations, image_root: str, batch_size: int, *,
                  stage_size: int = 256):
    """Yield (anns_batch, staged_u8 [n, S, S, 3]) over a corpus, skipping unreadable
    files with the reference's skip-on-error behavior (reference predict.py:57-88).
    Shared by the predict/parse CLIs."""
    from construction_clip_tpu.data.pipeline import default_load_image, host_shape_unify

    batch_imgs, batch_anns = [], []
    for a in annotations:
        try:
            img = default_load_image(os.path.join(image_root, a.file_name))
        except (FileNotFoundError, OSError) as e:
            print(f"skip {a.file_name}: {e}")
            continue
        batch_imgs.append(host_shape_unify(img, stage_size))
        batch_anns.append(a)
        if len(batch_imgs) == batch_size:
            import numpy as np

            yield batch_anns, np.stack(batch_imgs)
            batch_imgs, batch_anns = [], []
    if batch_imgs:
        import numpy as np

        yield batch_anns, np.stack(batch_imgs)


class HFTokenizerShim:
    """Minimal encode/decode facade over a `tokenizers` Tokenizer."""

    def __init__(self, tok):
        self._tok = tok

    def encode(self, text: str):
        enc = self._tok.encode(text)
        return enc.ids

    def decode(self, ids, skip_special_tokens=True):
        return self._tok.decode(list(int(i) for i in ids),
                                skip_special_tokens=skip_special_tokens)

    def vocab_size(self) -> int:
        return self._tok.get_vocab_size()


def tokenizer_vocab_size(tok) -> int | None:
    """Best-effort vocab size of a load_hf_tokenizer result (shim or HF)."""
    if hasattr(tok, "vocab_size") and callable(tok.vocab_size):
        return tok.vocab_size()
    try:
        return len(tok)  # transformers tokenizers
    except TypeError:
        return None


def fit_t5_vocab(tcfg, tok):
    """Grow tcfg.vocab_size (lane-padded to 128) to cover a custom tokenizer.

    A tokenizer larger than the model vocab would silently CLAMP ids under jit
    in training (XLA gather semantics) and IndexError at host-side inference.
    Train and predict CLIs both derive the size from the same tokenizer file,
    so their checkpoints stay shape-compatible."""
    import dataclasses

    vs = tokenizer_vocab_size(tok)
    if vs and vs > tcfg.vocab_size:
        padded = -(-vs // 128) * 128
        print(f"t5 vocab {tcfg.vocab_size} -> {padded} (tokenizer has {vs} tokens)")
        return dataclasses.replace(tcfg, vocab_size=padded)
    return tcfg

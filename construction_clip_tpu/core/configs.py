"""Typed model/workload configs.

The reference scatters hyperparameters across hardcoded constants and argparse defaults
(reference CLIP/train.py:107-131, CLIP_prefix_caption/train.py:386-402); here every model
and workload has one dataclass, JSON round-trippable, used by both the CLI shims and tests.
"""

from __future__ import annotations

import dataclasses
import json

@dataclasses.dataclass(frozen=True)
class VisionConfig:
    image_size: int = 224
    patch_size: int = 32
    width: int = 768
    layers: int = 12
    heads: int = 12
    embed_dim: int = 512  # output projection dim (shared image/text space)

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def seq_len(self) -> int:
        return self.grid * self.grid + 1  # + class token


@dataclasses.dataclass(frozen=True)
class TextConfig:
    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    layers: int = 12
    heads: int = 8
    embed_dim: int = 512


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    """OpenAI-CLIP-compatible two-tower config (defaults = ViT-B/32).

    Reference loads this architecture via `clip.load("ViT-B/32")`
    (reference CLIP/train.py:105); activation is QuickGELU, matching OpenAI
    checkpoints (HF calls this hidden_act="quick_gelu").
    """

    vision: VisionConfig = VisionConfig()
    text: TextConfig = TextConfig()
    quick_gelu: bool = True
    logit_scale_init: float = 2.6592  # ln(1/0.07), OpenAI init

    @staticmethod
    def vit_b_32() -> "CLIPConfig":
        return CLIPConfig()

    @staticmethod
    def vit_b_16() -> "CLIPConfig":
        return CLIPConfig(vision=VisionConfig(patch_size=16))

    @staticmethod
    def vit_l_14() -> "CLIPConfig":
        return CLIPConfig(
            vision=VisionConfig(patch_size=14, width=1024, layers=24, heads=16, embed_dim=768),
            text=TextConfig(width=768, heads=12, embed_dim=768),
        )

    @staticmethod
    def tiny() -> "CLIPConfig":
        """Small config for tests."""
        return CLIPConfig(
            vision=VisionConfig(image_size=32, patch_size=8, width=64, layers=2, heads=2, embed_dim=32),
            text=TextConfig(vocab_size=256, context_length=16, width=32, layers=2, heads=2, embed_dim=32),
        )

    @staticmethod
    def tiny_bpe() -> "CLIPConfig":
        """tiny, with a text vocabulary a real ClipTokenizer can match exactly:
        512 byte symbols + 6 merges + sot/eot = 520 (the BPE floor is 514; see
        tools/make_offline_assets.py --tiny). For end-to-end CLI smoke runs
        where checkpoint-consuming stages enforce tokenizer==model vocab."""
        return CLIPConfig(
            vision=VisionConfig(image_size=32, patch_size=8, width=64, layers=2, heads=2, embed_dim=32),
            text=TextConfig(vocab_size=520, context_length=24, width=32, layers=2, heads=2, embed_dim=32),
        )


@dataclasses.dataclass(frozen=True)
class GPT2Config:
    """HF-GPT2-compatible decoder config (defaults = ckiplab/gpt2-base-chinese size).

    Reference decoder: `GPT2LMHeadModel.from_pretrained('ckiplab/gpt2-base-chinese')`
    (reference CLIP_prefix_caption/train.py:275,401) — vocab 21128 (BERT-chinese vocab),
    12 layers, width 768.
    """

    vocab_size: int = 21128
    n_positions: int = 1024
    n_embd: int = 768
    n_layer: int = 12
    n_head: int = 12
    layer_norm_epsilon: float = 1e-5

    @staticmethod
    def tiny() -> "GPT2Config":
        return GPT2Config(vocab_size=128, n_positions=64, n_embd=32, n_layer=2, n_head=2)


@dataclasses.dataclass(frozen=True)
class T5Config:
    """HF-mT5-compatible config (defaults = google/mt5-small).

    Reference: `MT5ForConditionalGeneration.from_pretrained('google/mt5-small')`
    (reference CLIP_prefix_caption/train_t5.py:277-278).
    """

    vocab_size: int = 250112
    d_model: int = 512
    d_kv: int = 64
    d_ff: int = 1024
    num_layers: int = 8
    num_decoder_layers: int = 8
    num_heads: int = 6
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    tie_word_embeddings: bool = False

    @staticmethod
    def tiny() -> "T5Config":
        return T5Config(vocab_size=100, d_model=32, d_kv=8, d_ff=64,
                        num_layers=2, num_decoder_layers=2, num_heads=2)


@dataclasses.dataclass(frozen=True)
class ClipCapConfig:
    """Prefix-captioning stack config.

    Reference defaults: prefix_length 20, attribute_length 20, prefix dim 512 (ViT) /
    640 (RN50x4), mapper = MLP or TransformerMapper(8 layers)
    (reference CLIP_prefix_caption/train.py:386-415).
    """

    prefix_length: int = 20
    attribute_length: int = 20
    clip_dim: int = 512
    mapper: str = "mlp"  # "mlp" | "transformer"
    mapper_layers: int = 8
    clip_length: int = 10  # prefix tokens fed to TransformerMapper
    only_prefix: bool = True  # ClipCaptionPrefix: freeze the LM, train mapper only


def to_json(cfg) -> str:
    return json.dumps(dataclasses.asdict(cfg), indent=2)


def from_json(cls, s: str):
    d = json.loads(s)

    def build(c, dd):
        fields = {f.name: f for f in dataclasses.fields(c)}
        kwargs = {}
        for k, v in dd.items():
            f = fields[k]
            if dataclasses.is_dataclass(f.type) and isinstance(v, dict):
                kwargs[k] = build(f.type, v)
            elif isinstance(v, dict) and isinstance(f.default, tuple(
                    filter(dataclasses.is_dataclass, [type(f.default)]))):
                kwargs[k] = build(type(f.default), v)
            else:
                kwargs[k] = v
        return c(**kwargs)

    return build(cls, d)

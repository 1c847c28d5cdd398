"""construction_clip_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of zhuluntsai/Construction-CLIP.

Layers (bottom-up):
  core/      device mesh, precision policy, PRNG discipline, typed configs
  ops/       Pallas kernels + XLA ops (attention, layernorm, image preprocess, sampling)
  parallel/  sharding rules + collective wrappers (global-batch InfoNCE etc.)
  models/    CLIP (ViT + text tower), ClipCap mapper, GPT-2, mT5, LSTM captioner
  data/      annotation schema, datasets, host->HBM prefetch pipeline, ETL
  train/     jitted train steps, checkpointing (orbax), metrics
  infer/     KV-cached decode (greedy/beam/nucleus), zero-shot, explainability, scoring
  serve/     HTTP serving app (reference: application.py)

The reference implementation is a single-GPU PyTorch research repo; this package is a
ground-up TPU redesign — see SURVEY.md at the repo root for the component-by-component map.
"""

__version__ = "0.1.0"

"""PRNG discipline: explicit key threading, one helper to split named keys.

Reference "reproducibility" is `torch.manual_seed(567)` + cuDNN-deterministic flags
duplicated in every trainer (reference CLIP/train.py:28-34); here randomness is
functional: every init/apply takes explicit `jax.random` keys.
"""

from __future__ import annotations

import jax

REFERENCE_SEED = 567  # the seed the reference hardcodes everywhere


def key_chain(seed: int = REFERENCE_SEED):
    """Infinite iterator of fresh PRNG keys."""
    key = jax.random.key(seed)
    while True:
        key, sub = jax.random.split(key)
        yield sub


def split_named(key, *names):
    keys = jax.random.split(key, len(names))
    return dict(zip(names, keys))

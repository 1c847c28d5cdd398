"""Device-mesh construction and sharding helpers.

The reference is single-device (`torch.device('cuda:0')`, reference CLIP/train.py:103) —
this module is the layer it never had: every train/infer step in this framework runs under
a `jax.sharding.Mesh` with named axes, and all cross-chip communication is XLA collectives
over ICI (psum / all_gather inside shard_map), never host-mediated.

Axes:
  "data"  — batch (DP) axis; gradients psum here, InfoNCE logits all-gather here.
  "model" — tensor-parallel axis for the large-model configs (ViT-L/14 MLP & attention).
"""

from __future__ import annotations

import math
from typing import Mapping, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(
    axis_sizes: Mapping[str, int] | None = None,
    *,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build a Mesh over `devices` (default: all).

    axis_sizes maps axis name -> size; a single axis may be -1 (infer). With no
    argument, all devices go on the "data" axis and "model" has size 1, which is the
    right default for ViT-B-scale models (fits on one chip; scale = DP).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = {DATA_AXIS: n, MODEL_AXIS: 1}
    names = list(axis_sizes.keys())
    sizes = list(axis_sizes.values())
    if sizes.count(-1) > 1:
        raise ValueError("at most one axis size may be -1")
    if -1 in sizes:
        known = math.prod(s for s in sizes if s != -1)
        if n % known:
            raise ValueError(f"cannot infer axis: {n} devices not divisible by {known}")
        sizes[sizes.index(-1)] = n // known
    if math.prod(sizes) != n:
        raise ValueError(f"mesh {dict(zip(names, sizes))} != {n} devices")
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, tuple(names))


def local_mesh() -> Mesh:
    """Single-device mesh (CPU-runnable path, BASELINE.json config 1)."""
    return create_mesh({DATA_AXIS: 1, MODEL_AXIS: 1}, devices=jax.devices()[:1])


def named_sharding(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch(mesh: Mesh, batch):
    """Place a host pytree onto the mesh, batch-dim sharded over "data"."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)

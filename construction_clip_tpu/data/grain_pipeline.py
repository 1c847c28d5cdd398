"""Grain-backed input pipeline — the north star's "device-side prefetching grain
pipeline" replacing the reference's torch DataLoader (reference
attention_model/data_loader.py, CLIP/train.py:138-139).

grain.MapDataset drives sampling (shuffle/repeat/batch, deterministic per seed and
checkpointable by construction — index-based sampling means resume = remember the
step); decode + staging run in grain worker threads; the device hop reuses
pipeline.Prefetcher (async device_put, 2-deep) so bytes stream into HBM while the
current batch computes.

Same emit contract as pipeline.ImageTextLoader:
  {"images": uint8 [B, S, S, 3] (device), "tokens": int32 [B, ctx]}.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np

from construction_clip_tpu.data.pipeline import (
    Prefetcher, default_load_image, host_shape_unify)


class GrainImageTextLoader:
    def __init__(self, dataset, tokenize: Callable[[Sequence[str]], np.ndarray], *,
                 batch_size: int, mesh=None, image_size: int = 256,
                 load_image: Callable[[str], np.ndarray] = default_load_image,
                 shuffle: bool = True, seed: int = 567,
                 num_epochs: int | None = 1, read_threads: int = 8,
                 prefetch_depth: int = 2):
        import grain.python as grain

        self.mesh = mesh
        self.prefetch_depth = prefetch_depth
        self._grain = grain

        def to_item(i):
            files, texts = dataset[int(i)]
            if isinstance(files, str):
                files, texts = [files], [texts]
            imgs = np.stack([host_shape_unify(load_image(f), image_size)
                             for f in files])
            return {"images": imgs, "texts": list(texts)}

        ds = grain.MapDataset.source(grain.RangeDataSource(0, len(dataset), 1))
        if shuffle:
            ds = ds.seed(seed).shuffle()
        if num_epochs is None:
            ds = ds.repeat(None)
        elif num_epochs > 1:
            ds = ds.repeat(num_epochs)
        ds = ds.map(to_item)
        ds = ds.batch(batch_size, drop_remainder=True,
                      batch_fn=self._collate(tokenize))
        self._ds = ds
        self._read_threads = read_threads

    @staticmethod
    def _collate(tokenize):
        def fn(items):
            imgs = np.concatenate([it["images"] for it in items], axis=0)
            texts = [t for it in items for t in it["texts"]]
            return {"images": imgs, "tokens": tokenize(texts)}

        return fn

    def _device_put(self, batch):
        import jax

        if self.mesh is None:
            return jax.tree.map(jax.device_put, batch)
        from construction_clip_tpu.core.mesh import shard_batch

        return shard_batch(self.mesh, batch)

    def __iter__(self):
        it = iter(self._ds.to_iter_dataset(
            self._grain.ReadOptions(num_threads=self._read_threads,
                                    prefetch_buffer_size=self._read_threads * 2)))
        return iter(Prefetcher(it, self._device_put, depth=self.prefetch_depth))

    def __len__(self):
        return len(self._ds)

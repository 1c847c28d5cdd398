"""Host -> HBM input pipeline: threaded decode workers + double-buffered device puts.

The reference feeds the GPU with `DataLoader(num_workers=4)` doing PIL decode +
preprocess per item in worker processes (reference CLIP/train.py:138-139). The TPU
equivalent here:

  - a thread pool decodes/loads images to uint8 (PIL released the GIL during decode);
  - batches are assembled as pinned-contiguous numpy and `jax.device_put` STARTED for
    the next batch while the current one computes (device transfers are async in JAX),
    i.e. a 2-deep prefetch queue hides host->device latency;
  - resize/crop/normalize run ON DEVICE (data/preprocess.py), so only uint8 bytes
    cross PCIe.

Works with any dataset exposing __len__/__getitem__ -> (file_names, texts) or
arbitrary pytrees; a `load_image` hook lets tests substitute synthetic images for the
corpus files.
"""

from __future__ import annotations

import collections
import concurrent.futures as cf
from typing import Callable, Iterator, Sequence

import numpy as np


def default_load_image(path: str) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), dtype=np.uint8)


def host_shape_unify(img: np.ndarray, size: int) -> np.ndarray:
    """Uniform [size,size,3] uint8 via short-side scale + center crop (nearest-neighbor
    host pass; the device bicubic does the real resample to model resolution)."""
    h, w = img.shape[:2]
    if (h, w) != (size, size):
        scale = size / min(h, w)
        nh, nw = max(size, int(round(h * scale))), max(size, int(round(w * scale)))
        ys = (np.arange(nh) * (h / nh)).astype(np.int32).clip(0, h - 1)
        xs = (np.arange(nw) * (w / nw)).astype(np.int32).clip(0, w - 1)
        # torchvision CenterCrop margin rounding (int(round(m/2)), not m//2) —
        # keeps the staging crop aligned with preprocess.py and native/
        top, left = int(round((nh - size) / 2.0)), int(round((nw - size) / 2.0))
        # crop the INDEX arrays, then gather: the row take copies `size` rows
        # instead of nh, and no [nh, nw] intermediate is materialized (serving
        # stages every request on the host — 1.3-1.9x less host memory traffic
        # at typical upload shapes, bit-identical output)
        img = img[ys[top: top + size]][:, xs[left: left + size]]
    return img


def letterbox_dims(h: int, w: int, size: int) -> tuple[int, int]:
    """Effective (nh, nw) of the content region after host_letterbox: long side
    scaled to `size`, aspect preserved, each side at least 1 px."""
    scale = size / max(h, w)
    return (max(1, min(size, int(round(h * scale)))),
            max(1, min(size, int(round(w * scale)))))


def host_letterbox(img: np.ndarray, size: int) -> np.ndarray:
    """Uniform [size,size,3] uint8 via aspect-preserving LONG-side scale +
    zero pad (bottom/right). Unlike host_shape_unify's center crop, NO content
    is discarded — the detection-serving contract: torchvision's
    GeneralizedRCNNTransform resizes + batch-pads but never crops (the
    reference feeds it raw uploads, application.py:55-61), so every pixel must
    stay visible to the detector. Static square for one compiled program;
    inverse map is a pure per-axis scale (see JaxDetector._map_back)."""
    h, w = img.shape[:2]
    nh, nw = letterbox_dims(h, w, size)
    if (nh, nw) != (h, w):
        ys = (np.arange(nh) * (h / nh)).astype(np.int32).clip(0, h - 1)
        xs = (np.arange(nw) * (w / nw)).astype(np.int32).clip(0, w - 1)
        img = img[ys][:, xs]
    if (nh, nw) == (size, size):
        return img
    out = np.zeros((size, size, 3), dtype=img.dtype)
    out[:nh, :nw] = img
    return out


class Prefetcher:
    """Wrap a host-batch iterator; keep `depth` batches in flight on device."""

    def __init__(self, it: Iterator, put: Callable, depth: int = 2):
        self._it = it
        self._put = put
        self._depth = depth

    def __iter__(self):
        q = collections.deque()
        for host_batch in self._it:
            q.append(self._put(host_batch))  # device_put is async — transfer starts now
            if len(q) > self._depth:
                yield q.popleft()
        while q:
            yield q.popleft()


class ImageTextLoader:
    """Batched loader for (file_names, texts) datasets.

    Emits {"images": uint8 [B,H,W,3] (device, batch-sharded), "tokens": int32 [B,ctx]}.
    Images are decoded by threads and letterbox-resized on HOST only to unify shapes
    (cheap nearest-size pick); the quality bicubic resize happens on device.
    """

    def __init__(self, dataset, tokenize: Callable[[Sequence[str]], np.ndarray], *,
                 batch_size: int, mesh=None, image_size: int = 256,
                 load_image: Callable[[str], np.ndarray] = default_load_image,
                 shuffle: bool = True, seed: int = 567, drop_last: bool = True,
                 num_threads: int = 8, prefetch_depth: int = 2):
        self.dataset = dataset
        self.tokenize = tokenize
        self.batch_size = batch_size
        self.mesh = mesh
        self.image_size = image_size
        self.load_image = load_image
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_threads = num_threads
        self.prefetch_depth = prefetch_depth
        self._epoch = 0

    def _item(self, i: int):
        files, texts = self.dataset[i]
        if isinstance(files, str):
            files, texts = [files], [texts]
        imgs = np.stack([host_shape_unify(self.load_image(f), self.image_size)
                         for f in files])
        return imgs, list(texts)

    def _host_batches(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed + self._epoch).shuffle(order)
        self._epoch += 1
        bs = self.batch_size
        ends = len(order) - (len(order) % bs if self.drop_last else 0)
        with cf.ThreadPoolExecutor(self.num_threads) as pool:
            for start in range(0, ends, bs):
                idx = order[start: start + bs]
                items = list(pool.map(self._item, idx))
                imgs = np.concatenate([im for im, _ in items], axis=0)
                texts = [t for _, ts in items for t in ts]
                yield {"images": imgs, "tokens": self.tokenize(texts)}

    def _device_put(self, batch):
        import jax

        if self.mesh is None:
            return jax.tree.map(jax.device_put, batch)
        from construction_clip_tpu.core.mesh import shard_batch

        return shard_batch(self.mesh, batch)

    def __iter__(self):
        return iter(Prefetcher(self._host_batches(), self._device_put,
                               depth=self.prefetch_depth))

    def __len__(self):
        n = len(self.dataset) // self.batch_size
        return n if self.drop_last else -(-len(self.dataset) // self.batch_size)


class ArrayLoader:
    """Loader over in-memory arrays (the ClipCap precomputed-embedding path) with
    shuffling + device prefetch. items: dict of equal-length arrays."""

    def __init__(self, arrays: dict, *, batch_size: int, mesh=None,
                 shuffle: bool = True, seed: int = 567, drop_last: bool = True,
                 prefetch_depth: int = 2):
        lens = {len(v) for v in arrays.values()}
        assert len(lens) == 1, "ragged arrays"
        self.n = lens.pop()
        self.arrays = arrays
        self.batch_size = batch_size
        self.mesh = mesh
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch_depth = prefetch_depth
        self._epoch = 0

    def _host_batches(self):
        order = np.arange(self.n)
        if self.shuffle:
            np.random.default_rng(self.seed + self._epoch).shuffle(order)
        self._epoch += 1
        bs = self.batch_size
        ends = self.n - (self.n % bs if self.drop_last else 0)
        for start in range(0, ends, bs):
            idx = order[start: start + bs]
            yield {k: v[idx] for k, v in self.arrays.items()}

    def _device_put(self, batch):
        import jax

        if self.mesh is None:
            return jax.tree.map(jax.device_put, batch)
        from construction_clip_tpu.core.mesh import shard_batch

        return shard_batch(self.mesh, batch)

    def __iter__(self):
        return iter(Prefetcher(self._host_batches(), self._device_put,
                               depth=self.prefetch_depth))

    def __len__(self):
        return self.n // self.batch_size if self.drop_last else -(-self.n // self.batch_size)

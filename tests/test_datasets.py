"""Dataset index logic against the real corpus annotations (/root/reference/all.json,
806 annotations) + the streaming pipeline with synthetic images."""

import collections
import itertools
import json
import os

import numpy as np
import pytest

from construction_clip_tpu.data.datasets import (
    PairGroupDataset, CaptionPairDataset, PrecomputedCaptionDataset)
from construction_clip_tpu.data.pipeline import ImageTextLoader, ArrayLoader

ALL_JSON = "/root/reference/all.json"
REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
needs_corpus = pytest.mark.skipif(not os.path.exists(ALL_JSON),
                                  reason="reference corpus not mounted")


@needs_corpus
def test_pair_group_matches_reference_semantics():
    """Recompute the reference ClipPairDataset grouping (CLIP/train.py:63-99)
    independently and compare item outputs."""
    with open(ALL_JSON, encoding="utf-8") as f:
        anns = [a for a in json.load(f)["annotations"] if a["violation_type"] != ""]
    c = collections.Counter(a["violation_type"] for a in anns)
    combos = list(itertools.combinations(c.keys(), 9))
    train_c = {k: int(v * 0.8) for k, v in c.items()}

    ds = PairGroupDataset(ALL_JSON, key="violation_type", split="train",
                          train_ratio=0.8, combination_num=9)
    assert len(ds.groups) == len(combos) == 1  # 9 classes choose 9
    assert len(ds) == 50  # the reference's hardcoded 50/combination

    # item 7: one annotation per class, round-robin within class
    files, texts = ds[7]
    assert len(files) == len(texts) == 9
    for v, (f, t) in zip(combos[0], zip(files, texts)):
        group = [a for a in anns if a["violation_type"] == v][: train_c[v]]
        expect = group[7 % len(group)]
        assert t == v
        assert f == expect["file_name"]

    # test split gets the complement
    ds_test = PairGroupDataset(ALL_JSON, key="violation_type", split="test",
                               train_ratio=0.8, combination_num=9)
    f_tr = set(ds[0][0])
    f_te = set(ds_test[0][0])
    assert not (f_tr & f_te)


@needs_corpus
def test_pair_group_combinations():
    ds = PairGroupDataset(ALL_JSON, key="violation_type", split="train",
                          combination_num=2)
    assert len(ds.groups) == 36  # C(9,2)
    files, texts = ds[51]  # second combination, item 1
    assert len(files) == 2


@needs_corpus
def test_caption_pair_dataset():
    ds_tr = CaptionPairDataset(ALL_JSON, key="violation_list", split="train")
    ds_te = CaptionPairDataset(ALL_JSON, key="violation_list", split="test")
    with open(ALL_JSON, encoding="utf-8") as f:
        n = sum(1 for a in json.load(f)["annotations"] if a["violation_list"] != "")
    assert len(ds_tr) == int(n * 0.8)
    assert len(ds_tr) + len(ds_te) == n
    f, t = ds_tr[0]
    assert isinstance(f, str) and isinstance(t, str) and t


@needs_corpus
def test_image_text_loader_pipeline(rng):
    """End-to-end streaming with synthetic images; batch shapes + device residency."""
    import jax

    ds = CaptionPairDataset(ALL_JSON, key="violation_list", split="test")

    def fake_load(path):
        h = 300 + (hash(path) % 3) * 50  # mixed resolutions
        return (np.ones((h, 400, 3)) * (hash(path) % 255)).astype(np.uint8)

    def fake_tokenize(texts):
        return np.zeros((len(texts), 16), np.int32)

    loader = ImageTextLoader(ds, fake_tokenize, batch_size=4, image_size=64,
                             load_image=fake_load, num_threads=2)
    batches = list(itertools.islice(iter(loader), 3))
    assert len(batches) == 3
    for b in batches:
        assert b["images"].shape == (4, 64, 64, 3)
        assert b["images"].dtype == np.uint8
        assert b["tokens"].shape == (4, 16)
        assert isinstance(b["images"], jax.Array)


def test_array_loader(rng):
    arrays = {"prefix": rng.standard_normal((20, 8)).astype(np.float32),
              "tokens": rng.integers(0, 10, (20, 5)).astype(np.int32)}
    loader = ArrayLoader(arrays, batch_size=8)
    bs = list(iter(loader))
    assert len(bs) == 2
    assert bs[0]["prefix"].shape == (8, 8)
    # different epochs shuffle differently
    b2 = list(iter(loader))
    assert not np.array_equal(np.asarray(bs[0]["tokens"]), np.asarray(b2[0]["tokens"]))


def test_precomputed_dataset(rng):
    ds = PrecomputedCaptionDataset(rng.standard_normal((5, 4)),
                                   rng.integers(0, 9, (5, 3)),
                                   rng.integers(0, 9, (5, 2)))
    e, a, c = ds[2]
    assert e.shape == (4,) and a.shape == (2,) and c.shape == (3,)


def test_flickr_and_coco_datasets(tmp_path, rng):
    from construction_clip_tpu.data.datasets import FlickrDataset, CocoCaptionDataset
    import json

    csv = tmp_path / "captions.txt"
    csv.write_text("image,caption\na.jpg,a man on a scaffold\nb.jpg,an open pit\n",
                   encoding="utf-8")
    ds = FlickrDataset(str(csv), image_dir="imgs")
    assert len(ds) == 2
    f, c = ds[0]
    assert f == "imgs/a.jpg" and "scaffold" in c

    coco = tmp_path / "coco.json"
    coco.write_text(json.dumps({
        "images": [{"id": 1, "file_name": "x.jpg"}, {"id": 2, "file_name": "y.jpg"}],
        "annotations": [{"image_id": 1, "caption": "cap one"},
                        {"image_id": 2, "caption": "cap two"},
                        {"image_id": 9, "caption": "orphan"}],
    }), encoding="utf-8")
    ds = CocoCaptionDataset(str(coco))
    assert len(ds) == 2
    assert ds[1] == ("y.jpg", "cap two")


def test_load_reference_pickle(tmp_path):
    import pickle
    import torch

    from construction_clip_tpu.infer.precompute import load_archive

    data = {"clip_embedding": torch.ones(3, 4),
            "captions": [{"caption": "說明", "attribute": "缺失 墜落 "},
                         {"caption": "", "violation_list": "清單", "attribute": "a "},
                         {"caption": "c3", "attribute": "b "}]}
    p = tmp_path / "emb.pkl"
    with open(p, "wb") as f:
        pickle.dump(data, f)
    arc = load_archive(str(p))
    assert arc["embeddings"].shape == (3, 4)
    assert list(arc["captions"]) == ["說明", "清單", "c3"]
    assert list(arc["attributes"])[0] == "缺失 墜落 "


@needs_corpus
def test_grain_loader(rng):
    """grain-backed pipeline emits the same contract as ImageTextLoader."""
    import jax

    from construction_clip_tpu.data.grain_pipeline import GrainImageTextLoader

    ds = CaptionPairDataset(ALL_JSON, key="violation_list", split="test")

    def fake_load(path):
        return (np.ones((80, 100, 3)) * (hash(path) % 255)).astype(np.uint8)

    def fake_tokenize(texts):
        return np.zeros((len(texts), 8), np.int32)

    loader = GrainImageTextLoader(ds, fake_tokenize, batch_size=4, image_size=32,
                                  load_image=fake_load, read_threads=2)
    batches = list(itertools.islice(iter(loader), 3))
    assert len(batches) == 3
    for b in batches:
        assert b["images"].shape == (4, 32, 32, 3)
        assert b["images"].dtype == np.uint8
        assert b["tokens"].shape == (4, 8)
        assert isinstance(b["images"], jax.Array)
    # deterministic per seed
    l2 = GrainImageTextLoader(ds, fake_tokenize, batch_size=4, image_size=32,
                              load_image=fake_load, read_threads=2)
    b1 = next(iter(loader))
    b2 = next(iter(l2))
    np.testing.assert_array_equal(np.asarray(b1["images"]), np.asarray(b2["images"]))


def test_stream_corpus_helper(tmp_path):
    """apps/common.stream_corpus: batching + skip-on-missing semantics."""
    import sys

    sys.path.insert(0, os.path.join(REPO_ROOT, "apps"))
    from common import stream_corpus

    from PIL import Image

    from construction_clip_tpu.data.schema import Annotation

    rng = np.random.default_rng(0)
    anns = []
    for i in range(5):
        fn = f"s{i}.jpg"
        Image.fromarray((rng.random((50, 70, 3)) * 255).astype(np.uint8)).save(
            tmp_path / fn)
        anns.append(Annotation(id=i, file_name=fn))
    anns.insert(2, Annotation(id=99, file_name="MISSING.jpg"))

    batches = list(stream_corpus(anns, str(tmp_path), batch_size=2, stage_size=32))
    sizes = [len(b[0]) for b in batches]
    assert sizes == [2, 2, 1]  # 5 readable, missing skipped, remainder flushed
    for batch_anns, staged in batches:
        assert staged.shape == (len(batch_anns), 32, 32, 3)
        assert staged.dtype == np.uint8
    assert all(a.id != 99 for b in batches for a in b[0])

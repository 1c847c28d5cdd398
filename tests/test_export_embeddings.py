"""export_prediction.py parity: the -1-padded OriginalClipCapDataset (mask from
ge(0), token-cache pkl, max_seq_len recompute) and the per-word PCA(1) export
semantics vs sklearn (reference CLIP_prefix_caption/export_prediction.py:40-97,
500-530)."""

import json
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

from construction_clip_tpu.data.datasets import OriginalClipCapDataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def fake_encode(text):
    return [ord(c) % 500 + 10 for c in text]


@pytest.fixture
def ds_inputs():
    caps = ["墜落危險", "工人未戴安全帽於高處作業", "電線裸露"]
    embeds = np.arange(3 * 4, dtype=np.float32).reshape(3, 4)
    return embeds, caps


def test_neg1_padding_mask_semantics(ds_inputs):
    embeds, caps = ds_inputs
    ds = OriginalClipCapDataset(embeds, caps, fake_encode, prefix_length=3)
    lens = np.array([len(fake_encode(c)) for c in caps], dtype=np.float64)
    expect_max = min(int(lens.mean() + lens.std(ddof=1) * 10), int(lens.max()))
    assert ds.max_seq_len == expect_max

    tokens, mask = ds.pad_tokens(0)
    n_real = len(fake_encode(caps[0]))
    assert tokens.shape == (ds.max_seq_len,)
    assert mask.shape == (3 + ds.max_seq_len,)
    # prefix positions always unmasked; real tokens unmasked; pad masked
    np.testing.assert_array_equal(mask[:3], 1.0)
    np.testing.assert_array_equal(mask[3:3 + n_real], 1.0)
    np.testing.assert_array_equal(mask[3 + n_real:], 0.0)
    # pad clamped to 0 after mask taken
    np.testing.assert_array_equal(tokens[n_real:], 0)

    # reference quirk: the in-place clamp means a SECOND call sees ge(0)
    # all-true -> all-ones mask (export_prediction.py mutates the stored tensor)
    _, mask2 = ds.pad_tokens(0)
    np.testing.assert_array_equal(mask2, 1.0)


def test_truncation_and_getitem(ds_inputs):
    embeds, caps = ds_inputs
    ds = OriginalClipCapDataset(embeds, caps, fake_encode, prefix_length=2,
                                normalize_prefix=True)
    toks, mask, prefix = ds[1]  # the longest caption -> truncated to max_seq_len
    assert toks.shape == (ds.max_seq_len,)
    np.testing.assert_allclose(np.linalg.norm(prefix), 1.0, rtol=1e-6)


def test_token_cache_roundtrip(tmp_path, ds_inputs):
    embeds, caps = ds_inputs
    cache = str(tmp_path / "emb_tokens.pkl")
    ds1 = OriginalClipCapDataset(embeds, caps, fake_encode, prefix_length=2,
                                 cache_path=cache)
    assert os.path.isfile(cache)
    with open(cache, "rb") as f:
        toks, c2e, _ = pickle.load(f)
    assert len(toks) == 3 and c2e == [0, 1, 2]

    # second construction loads the cache (encode is never called)
    def boom(_):
        raise AssertionError("cache not used")

    ds2 = OriginalClipCapDataset(embeds, caps, boom, prefix_length=2,
                                 cache_path=cache)
    assert ds2.max_seq_len == ds1.max_seq_len
    np.testing.assert_array_equal(ds2.pad_tokens(2)[0], ds1.pad_tokens(2)[0])


def test_word_pca_matches_sklearn():
    """The export math: per word, PCA(1).fit_transform(wte[ids].T).T[0]."""
    sklearn = pytest.importorskip("sklearn.decomposition")
    rng = np.random.default_rng(0)
    wte = rng.standard_normal((50, 16)).astype(np.float64)
    ids = [3, 17, 42]
    vec_t = wte[ids].T
    centered = vec_t - vec_t.mean(axis=0)
    _, _, vt = np.linalg.svd(centered, full_matrices=False)
    scores = centered @ vt[0]
    if scores[np.argmax(np.abs(scores))] < 0:
        scores = -scores
    ref = sklearn.PCA(n_components=1).fit_transform(vec_t).T[0]
    np.testing.assert_allclose(scores, ref, rtol=1e-8, atol=1e-10)


@pytest.mark.slow
def test_export_cli_writes_word_lines(tmp_path):
    anns = {"annotations": [
        {"id": i, "caption": "墜落危險 高處作業" if i % 2 else "墜落防護缺失",
         "violation_list": "", "caption_type": "violation", "violation_type": "墜落",
         "file_name": f"x{i}.jpg", "objects": []} for i in range(6)]}
    jp = tmp_path / "anns.json"
    jp.write_text(json.dumps(anns), encoding="utf-8")
    vocab = tmp_path / "vocab.txt"
    chars = sorted({c for a in anns["annotations"] for c in a["caption"]})
    vocab.write_text("\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
                               + chars) + "\n", encoding="utf-8")
    out = tmp_path / "emb.txt"
    # PYTHONPATH=REPO only (like every other CLI test): appending the inherited
    # path would keep /root/.axon_site's sitecustomize in the subprocess, and
    # that TPU plugin probes its tunnel at import — with the tunnel unhealthy
    # the CLI blocks in the plugin's reconnect loop until this test times out
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "apps", "export_embeddings.py"),
         "--json_path", str(jp), "--out", str(out), "--top_k", "5",
         "--tokenizer", str(vocab), "--tiny"],
        capture_output=True, text=True, env=env, cwd=os.path.join(REPO, "apps"),
        timeout=480)
    assert r.returncode == 0, r.stderr[-2000:]
    lines = out.read_text(encoding="utf-8").strip().splitlines()
    assert lines, "no output lines"
    first = lines[0].split()
    assert not first[0].isdigit()
    assert len(first) > 1 + 16  # word + n_embd PCA scores (tiny n_embd=32)

"""CLI surface smoke tests: the reference-compatible entry points run end-to-end on
synthetic corpora (subprocess for the light tools, in-process for the jax-heavy ones)."""

import gzip
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
APPS = os.path.join(REPO, "apps")


def run_cli(script, *argv, timeout=120):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    return subprocess.run([sys.executable, os.path.join(APPS, script), *argv],
                          capture_output=True, text=True, timeout=timeout, env=env)


@pytest.fixture()
def corpus(tmp_path):
    """Tiny synthetic corpus: 6 annotations with images on disk."""
    from PIL import Image

    rng = np.random.default_rng(0)
    anns = []
    for i in range(6):
        fn = f"img_{i}.jpg"
        Image.fromarray((rng.random((96, 128, 3)) * 255).astype(np.uint8)).save(
            tmp_path / fn)
        anns.append({"id": i, "caption_type": "violation" if i % 2 else "status",
                     "violation_type": ["墜落", "機械", "物料"][i % 3],
                     "violation_list": f"示例缺失{i}", "caption": f"示例說明{i}",
                     "file_name": fn, "objects": ""})
    path = tmp_path / "test.json"
    path.write_text(json.dumps({"type": "captions", "annotations": anns},
                               ensure_ascii=False), encoding="utf-8")
    return tmp_path, str(path)


@pytest.fixture()
def merges_gz(tmp_path):
    p = tmp_path / "merges.txt.gz"
    with gzip.open(p, "wt", encoding="utf-8") as f:
        f.write("version\na b\n")
    return str(p)


def test_json_to_text_and_train_tokenizer(corpus, tmp_path):
    root, json_path = corpus
    txt = str(tmp_path / "text.txt")
    r = run_cli("json_to_text.py", "--json_path", json_path, "--out", txt)
    assert r.returncode == 0, r.stderr
    assert "6 lines" in r.stdout
    tok_json = str(tmp_path / "bpe.json")
    r = run_cli("train_tokenizer.py", "--input", txt, "--out", tok_json,
                "--vocab_size", "300")
    assert r.returncode == 0, r.stderr
    from tokenizers import Tokenizer

    tok = Tokenizer.from_file(tok_json)
    assert tok.get_vocab_size() > 5


def test_score_cli(tmp_path):
    log = tmp_path / "output_log.json"
    log.write_text(json.dumps([
        {"ground_truth_caption": "工人未戴安全帽", "caption": "工人未戴安全帽"},
        {"ground_truth_caption": "開口未設護欄", "caption": "開口無護欄"},
    ], ensure_ascii=False), encoding="utf-8")
    r = run_cli("score.py", str(log))
    assert r.returncode == 0, r.stderr
    out = json.loads(r.stdout)
    assert out["n"] == 2 and 0 < out["bleu"] <= 1


def test_predict_zeroshot_inprocess(corpus, merges_gz, tmp_path, monkeypatch, capsys):
    root, json_path = corpus
    out_json = str(tmp_path / "preds.json")
    monkeypatch.syspath_prepend(APPS)
    monkeypatch.setattr(sys, "argv", [
        "predict_zeroshot.py", "--json_path", json_path, "--image_root", str(root),
        "--arch", "tiny", "--clip_bpe", merges_gz, "--batch_size", "4",
        "--out", out_json])
    import importlib

    mod = importlib.import_module("predict_zeroshot")
    mod.main()
    captured = capsys.readouterr()
    assert "accuracy:" in captured.out
    preds = json.loads(open(out_json, encoding="utf-8").read())
    assert len(preds) == 6
    assert all(p["prediction"] in
               ("墜落", "機械", "物料", "感電", "防護具", "穿刺", "爆炸", "工作場所", "搬運")
               for p in preds)

"""The chained product pipeline (reference workflow CLIP/train.py:101 ->
parse_coco.py:15 -> CLIP_prefix_caption/train.py:326 -> test.py:556 ->
score.py:8) driven end-to-end through the real CLIs at test scale: every stage
must consume the previous stage's artifact unmodified, train losses must
decrease, scoring must produce numbers. tools/run_product_e2e.py is the same
driver used for the full-scale TPU run."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_product_e2e_tiny(tmp_path):
    wd = str(tmp_path / "e2e")
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    # don't inherit the suite's 8-virtual-device flag: per-device batch sizing
    # in the CLIs would multiply past the tiny corpus
    env.pop("XLA_FLAGS", None)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/run_product_e2e.py"),
         "--workdir", wd, "--arch", "tiny_bpe", "--gpt_size", "tiny",
         "--subset", "48", "--clip_epochs", "3", "--cap_epochs", "6",
         "--clip_groups_per_batch", "1", "--cap_bs", "8", "--device", "cpu"],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]

    summary = json.load(open(os.path.join(wd, "summary.json"), encoding="utf-8"))
    assert summary["ok"]
    assert summary["losses_decreased"], summary
    assert {s["stage"] for s in summary["stages"]} == {
        "train_clip", "parse_corpus", "train_clipcap", "predict", "score",
        "visualize"}
    assert all(s["rc"] == 0 for s in summary["stages"])
    # the held-out split really was captioned and scored
    assert summary["n_predictions"] and summary["n_predictions"] >= 8
    assert summary["score"] and summary["score"]["n"] > 0
    assert 0 <= summary["score"]["bleu"] <= 1
    # stage artifacts exist where the next stage read them
    for rel in ("models/clip_latest.npz", "embedding.npz", "models/clipcap.npz",
                "output/output_log.json", "curves.png"):
        assert os.path.exists(os.path.join(wd, rel)), rel

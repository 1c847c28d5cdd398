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


GPT2_STAGES = {"train_clip", "parse_corpus", "train_clipcap", "predict",
               "score", "visualize"}
T5_STAGES = {"json_to_text", "train_tokenizer", "train_clipcap_t5",
             "predict_t5", "score_t5"}


def _run_e2e(wd, extra, timeout):
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    # don't inherit the suite's 8-virtual-device flag: per-device batch sizing
    # in the CLIs would multiply past the tiny corpus
    env.pop("XLA_FLAGS", None)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/run_product_e2e.py"),
         "--workdir", wd, "--arch", "tiny_bpe", "--gpt_size", "tiny",
         "--subset", "48", "--clip_epochs", "3", "--cap_epochs", "6",
         "--clip_groups_per_batch", "1", "--cap_bs", "8", "--device", "cpu",
         *extra],
        capture_output=True, text=True, timeout=timeout, env=env, cwd=REPO)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    return json.load(open(os.path.join(wd, "summary.json"), encoding="utf-8"))


def _check_gpt2_chain(wd, summary):
    assert summary["ok"]
    assert summary["losses_decreased"], summary
    assert all(s["rc"] == 0 for s in summary["stages"])
    # every stage record carries full provenance
    for s in summary["stages"]:
        assert s["argv"] and s["seconds"] >= 0 and s["log"], s
    # the held-out split really was captioned and scored
    assert summary["n_predictions"] and summary["n_predictions"] >= 8
    assert summary["score"] and summary["score"]["n"] > 0
    assert 0 <= summary["score"]["bleu"] <= 1
    # stage artifacts exist where the next stage read them
    for rel in ("models/clip_latest.npz", "embedding.npz", "models/clipcap.npz",
                "output/output_log.json", "curves.png"):
        assert os.path.exists(os.path.join(wd, rel)), rel


@pytest.mark.slow
def test_product_e2e_tiny(tmp_path):
    """GPT-2 decoder chain only (--no_t5): the reference's original six-stage
    workflow (CLIP/train.py:101 -> parse_coco.py -> CLIP_prefix_caption/
    train.py -> test.py -> score.py)."""
    wd = str(tmp_path / "e2e")
    summary = _run_e2e(wd, ["--no_t5"], timeout=900)
    assert {s["stage"] for s in summary["stages"]} == GPT2_STAGES
    _check_gpt2_chain(wd, summary)


@pytest.mark.slow
def test_product_e2e_tiny_t5(tmp_path):
    """Default 11-stage chain: GPT-2 workflow plus the reference's second
    decoder family (json_to_text.py -> train_tokenizer.py -> train_t5.py ->
    test_t5.py -> score.py, CLIP_prefix_caption/{train_t5.py:409,
    test_t5.py:457})."""
    wd = str(tmp_path / "e2e")
    summary = _run_e2e(
        wd, ["--t5_size", "tiny", "--t5_epochs", "30", "--warmup", "4"],
        timeout=1800)
    assert {s["stage"] for s in summary["stages"]} == GPT2_STAGES | T5_STAGES
    _check_gpt2_chain(wd, summary)
    # the mT5 chain scored real held-out captions too
    assert summary["t5_n_predictions"] and summary["t5_n_predictions"] >= 8
    assert summary["t5_score"] and summary["t5_score"]["n"] > 0
    assert 0 <= summary["t5_score"]["bleu"] <= 1
    assert summary["t5_loss"]["min"] < summary["t5_loss"]["first"][1]
    for rel in ("text.txt", "models/t5_prefix.npz", "output/output_t5.json"):
        assert os.path.exists(os.path.join(wd, rel)), rel

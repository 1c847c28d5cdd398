"""End-to-end smoke of the contrastive train CLI (the most wired-up entry point):
class-balanced sampler -> streaming loader -> shard_map step -> orbax checkpoint ->
cold-process resume. Subprocess, tiny arch, synthetic corpus."""

import gzip
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=560):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    return subprocess.run([sys.executable, os.path.join(REPO, "apps/train_clip.py"),
                           *args], capture_output=True, text=True, timeout=timeout,
                          env=env)


@pytest.mark.slow
def test_train_clip_cli_trains_and_resumes(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(4)
    vts = ["墜落", "機械", "物料"]
    anns = []
    for i in range(9):
        fn = f"im{i}.jpg"
        Image.fromarray((rng.random((64, 80, 3)) * 255).astype(np.uint8)).save(
            tmp_path / fn)
        anns.append({"id": i, "caption_type": "violation",
                     "violation_type": vts[i % 3], "violation_list": f"x{i}",
                     "caption": "", "file_name": fn, "objects": ""})
    (tmp_path / "all.json").write_text(
        json.dumps({"type": "captions", "annotations": anns}, ensure_ascii=False),
        encoding="utf-8")
    with gzip.open(tmp_path / "merges.txt.gz", "wt", encoding="utf-8") as f:
        f.write("version\n")

    common = ["--json_path", str(tmp_path / "all.json"),
              "--image_path", str(tmp_path), "--arch", "tiny",
              "--precision", "fp32", "--clip_bpe", str(tmp_path / "merges.txt.gz"),
              "--combination_num", "3", "--save_every", "1",
              "--output_dir", str(tmp_path / "m"), "--log_dir", str(tmp_path / "log"),
              "--warmup_steps", "0"]
    r = _run(common + ["--epochs", "1"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "loss" in r.stdout

    r2 = _run(common + ["--epochs", "2"])
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "resumed from epoch 1" in r2.stdout

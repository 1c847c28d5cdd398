"""Training observability: step timing, metric logging, TensorBoard-compatible output.

The reference logs loss/accuracy/lr to TensorBoard SummaryWriter per run-name dir
(reference CLIP/train.py:133,177-179) and prints tqdm postfix stats. Here:
  - MetricLogger accumulates host-side scalars and writes (a) JSONL (always) and
    (b) TensorBoard event files when `tensorboard` / `tensorboardX` is importable
    (gated — not baked into this image);
  - StepTimer measures real device step time (syncs via host transfer — see
    .claude/skills/verify/SKILL.md on block_until_ready through the axon tunnel);
  - profile() wraps jax.profiler traces for deep dives.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Optional


class MetricLogger:
    def __init__(self, log_dir: str, run_name: str = "run"):
        os.makedirs(log_dir, exist_ok=True)
        self.jsonl_path = os.path.join(log_dir, f"{run_name}.jsonl")
        self._jsonl = open(self.jsonl_path, "a", encoding="utf-8")
        self._tb = None
        for mod in ("torch.utils.tensorboard", "tensorboardX"):
            try:
                import importlib

                writer_mod = importlib.import_module(mod)
                self._tb = writer_mod.SummaryWriter(log_dir=os.path.join(log_dir, run_name))
                break
            except Exception:
                continue

    def log(self, step: int, **scalars):
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, float(v), int(step))

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


class StepTimer:
    """Rolling step-time / throughput meter."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times: list[float] = []
        self._last = None

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        dt = None
        if self._last is not None:
            dt = now - self._last
            self._times.append(dt)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now
        return dt

    @property
    def mean(self) -> float:
        return sum(self._times) / len(self._times) if self._times else 0.0

    def per_second(self, items_per_step: int) -> float:
        return items_per_step / self.mean if self.mean else 0.0


@contextlib.contextmanager
def profile(log_dir: str, *, enabled: bool = True):
    """jax.profiler trace context — open the dir with TensorBoard's profile plugin
    or xprof. The tracing hook the reference never had (SURVEY.md §5)."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

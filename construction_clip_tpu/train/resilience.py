"""Failure detection + elastic recovery.

The reference has NONE of this (SURVEY.md §5): failures are bare
`try/except: print(e)` around whole items (reference predict.py:57-88) and resume
means hand-editing checkpoint paths and step counters (reference CLIP/train.py:107-116).
Here:

  StepWatchdog   — detects stalled device steps (e.g. a wedged TPU-runtime RPC: we
                   observed multi-minute silent stalls through the tunnel) and fires
                   a callback / logs after `timeout` seconds without progress.
  run_resilient  — drives a training epoch function with periodic orbax snapshots,
                   restart-from-latest-checkpoint on exception, and bounded retries;
                   makes any train loop crash-resumable without hand-edits.
  deterministic  — seeded end-to-end reproducibility helper (the reference's
                   seed-567-everywhere discipline, reference CLIP/train.py:28-34,
                   as one function instead of copy-paste).
"""

from __future__ import annotations

import threading
import time
import traceback
from typing import Callable, Optional


class StepWatchdog:
    """Background monitor: call .tick() per completed step; if no tick arrives for
    `timeout` seconds, `on_stall(seconds_since_progress)` fires (once per stall)."""

    def __init__(self, timeout: float = 300.0,
                 on_stall: Optional[Callable[[float], None]] = None,
                 poll: float = 5.0):
        self.timeout = timeout
        self.on_stall = on_stall or (lambda dt: print(
            f"[watchdog] no step progress for {dt:.0f}s — device stall suspected",
            flush=True))
        self.poll = poll
        self._last = time.monotonic()
        self._stalled = False
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self.stall_count = 0

    def tick(self) -> None:
        self._last = time.monotonic()
        self._stalled = False

    def _run(self) -> None:
        while not self._stop.wait(self.poll):
            dt = time.monotonic() - self._last
            if dt > self.timeout and not self._stalled:
                self._stalled = True
                self.stall_count += 1
                try:
                    self.on_stall(dt)
                except Exception:
                    traceback.print_exc()

    def __enter__(self) -> "StepWatchdog":
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=self.poll + 1)


def run_resilient(train_epoch: Callable[[object, int], object], state, *,
                  epochs: int, checkpoint_dir: str, save_every_epochs: int = 1,
                  max_retries: int = 3,
                  on_retry: Optional[Callable[[int, Exception], None]] = None):
    """Run `train_epoch(state, epoch) -> state` for `epochs`, checkpointing every
    `save_every_epochs`; on exception, restore the latest checkpoint and retry
    (up to max_retries consecutive failures). Returns the final state."""
    from construction_clip_tpu.train.checkpoint import (
        save_state, restore_state, latest_step)

    start_epoch = 0
    existing = latest_step(checkpoint_dir)
    if existing is not None:
        state = restore_state(checkpoint_dir, state)
        start_epoch = existing
        print(f"[resilience] resumed from epoch {start_epoch}")

    retries = 0
    epoch = start_epoch
    while epoch < epochs:
        try:
            state = train_epoch(state, epoch)
            retries = 0
            if (epoch + 1) % save_every_epochs == 0 or epoch == epochs - 1:
                save_state(checkpoint_dir, state, step=epoch + 1)
            epoch += 1
        except KeyboardInterrupt:
            save_state(checkpoint_dir, state, step=epoch)
            raise
        except Exception as e:  # noqa: BLE001 — deliberate: retry any step failure
            retries += 1
            if on_retry:
                on_retry(retries, e)
            print(f"[resilience] epoch {epoch} failed ({type(e).__name__}: {e}); "
                  f"retry {retries}/{max_retries}")
            if retries > max_retries:
                raise
            last = latest_step(checkpoint_dir)
            if last is not None:
                state = restore_state(checkpoint_dir, state)
                epoch = last
    return state


def deterministic(seed: int = 567):
    """One-call reproducibility: numpy + jax key (the reference scatters
    torch/np/random seeding into every trainer). Returns a jax PRNG key."""
    import numpy as np
    import jax

    np.random.seed(seed)
    return jax.random.key(seed)

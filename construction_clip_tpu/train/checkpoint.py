"""Checkpoint / resume: params + optimizer state + step, with real resume.

The reference's checkpointing is `torch.save(model.state_dict())` on an epoch cadence
with lineage encoded in filenames and resume done by hand-editing paths and step
counters (reference CLIP/train.py:107-116,211-217; CLIP_prefix_caption/train.py:371-381;
only attention_model/train.py:184-193 saves optimizer state). Here a checkpoint is the
full TrainState (params, opt_state, step) via orbax, so resume is
`state = restore(dir, template)` — no hand-editing.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def _manager(directory: str, max_to_keep: int = 5):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
    )


def save_state(directory: str, state, *, step: Optional[int] = None,
               max_to_keep: int = 5, wait: bool = True) -> int:
    """Save a TrainState (or any pytree). Returns the step used."""
    import orbax.checkpoint as ocp

    step = int(state.step) if step is None and hasattr(state, "step") else int(step or 0)
    mgr = _manager(directory, max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave(state))
    if wait:
        mgr.wait_until_finished()
    mgr.close()
    return step


def restore_state(directory: str, template, *, step: Optional[int] = None):
    """Restore into the structure of `template` (an abstract or concrete pytree).
    step=None -> latest."""
    import orbax.checkpoint as ocp

    mgr = _manager(directory)
    if step is None:
        step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {directory}")
    restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
    mgr.close()
    return restored


def latest_step(directory: str) -> Optional[int]:
    import orbax.checkpoint as ocp

    try:
        mgr = _manager(directory)
    except Exception:
        return None
    s = mgr.latest_step()
    mgr.close()
    return s


def save_params_npz(path: str, params) -> None:
    """Flat portable dump of params only (for interchange, like the reference's
    weights-only .pt files)."""
    import numpy as np

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for kp, leaf in flat:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in kp)
        out[key] = np.asarray(leaf)
    np.savez(path, **out)


def load_params_npz(path: str, template):
    import numpy as np

    data = np.load(path, allow_pickle=False)
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for kp, leaf in flat:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in kp)
        arr = data[key]
        assert arr.shape == leaf.shape, (key, arr.shape, leaf.shape)
        leaves.append(arr.astype(leaf.dtype))
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template), leaves)

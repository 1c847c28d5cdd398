"""Sharded checkpoint round-trip: a TP-sharded TrainState (Megatron CLIP param
shardings over the 8-device virtual mesh) must save and restore with values AND
shardings intact, and the restored state must step under the GSPMD trainer.

The reference has no distributed checkpointing at all (torch.save of a local
state_dict, reference CLIP/train.py:107-116); orbax handles sharded arrays
natively, so multi-chip resume is the same two calls as single-chip.
"""

import numpy as np
import jax
import jax.numpy as jnp

from construction_clip_tpu.core.configs import CLIPConfig
from construction_clip_tpu.core.mesh import DATA_AXIS, MODEL_AXIS, create_mesh
from construction_clip_tpu.models.clip import init_clip
from construction_clip_tpu.parallel.sharding import shard_clip_params
from construction_clip_tpu.train.checkpoint import restore_state, save_state
from construction_clip_tpu.train.contrastive import make_gspmd_train_step
from construction_clip_tpu.train.state import TrainState, make_adamw


def test_sharded_state_roundtrip_and_resume(tmp_path):
    cfg = CLIPConfig.tiny()
    mesh = create_mesh({DATA_AXIS: 2, MODEL_AXIS: 4})
    params = shard_clip_params(mesh, init_clip(jax.random.key(0), cfg))
    tx = make_adamw(1e-3, warmup_steps=0, total_steps=100)
    state = TrainState.create(params, tx)
    step = make_gspmd_train_step(cfg, tx, mesh)

    b = 8
    toks = jnp.zeros((b, cfg.text.context_length), jnp.int32)
    toks = toks.at[:, 0].set(1).at[:, 1].set(2)
    batch = {"images": jax.random.normal(
        jax.random.key(1), (b, cfg.vision.image_size, cfg.vision.image_size, 3)),
        "tokens": toks}
    state, m1 = step(state, batch)

    d = str(tmp_path / "ckpt")
    save_state(d, state)

    # template: abstract arrays carrying the live shardings
    template = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding),
        state)
    restored = restore_state(d, template)
    assert int(restored.step) == 1
    for a, b_ in zip(jax.tree.leaves(state.params),
                     jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
        assert b_.sharding == a.sharding, (a.sharding, b_.sharding)

    # resume: the restored state steps under the same jitted GSPMD trainer
    resumed, m2 = step(restored, batch)
    assert int(resumed.step) == 2
    assert np.isfinite(float(m2["loss"]))

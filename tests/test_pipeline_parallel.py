"""Pipeline parallelism (parallel/pipeline.py): the GPipe microbatch schedule
over the "pipe" mesh axis must match single-device numerics — forward, loss,
and one optimizer step — and the block params must actually be stage-sharded.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from construction_clip_tpu.core.configs import ClipCapConfig, GPT2Config
from construction_clip_tpu.core.mesh import create_mesh, DATA_AXIS
from construction_clip_tpu.models.clipcap import init_clipcap
from construction_clip_tpu.models.clipcap.model import (
    clipcap_forward, clipcap_forward_pp, caption_loss)
from construction_clip_tpu.models.gpt2 import gpt2_forward, init_gpt2
from construction_clip_tpu.parallel.pipeline import (
    PIPE_AXIS, pipelined_blocks)
from construction_clip_tpu.train.caption import (
    make_caption_train_step, make_caption_train_step_pp,
    shard_clipcap_params_pp)
from construction_clip_tpu.train.state import TrainState

GCFG = GPT2Config(vocab_size=96, n_positions=64, n_embd=32, n_layer=4, n_head=2)
CCFG = ClipCapConfig(prefix_length=3, attribute_length=2, clip_dim=16,
                     only_prefix=False)


@pytest.fixture(scope="module")
def batch(rng=np.random.default_rng(7)):
    B, T = 8, 6
    toks = rng.integers(1, 96, (B, T)).astype(np.int32)
    toks[:, -2:] = 0  # some ignore_id padding
    return {
        "tokens": jnp.asarray(toks),
        "prefix": jnp.asarray(rng.standard_normal((B, 16)), jnp.float32),
        "attribute": jnp.asarray(rng.integers(1, 96, (B, 2)), jnp.int32),
    }


def test_pipelined_blocks_match_scan():
    """Raw block pipeline at PP=4: identical hidden states to gpt2_forward's
    single-device layer scan on the same stacked params."""
    params = init_gpt2(jax.random.key(0), GCFG)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((8, 6, 32)),
                    jnp.float32)

    ref, _ = gpt2_forward(params, GCFG, inputs_embeds=x)

    mesh = create_mesh({PIPE_AXIS: 4, DATA_AXIS: 2})
    h0 = x + params["wpe"][jnp.arange(6)]
    out = pipelined_blocks(params["blocks"], h0, None, GCFG, mesh,
                           microbatches=4)
    # compose the head the same way gpt2_forward does
    from construction_clip_tpu.models.gpt2 import _lm_logits, layer_norm
    logits = _lm_logits(params, layer_norm(out, **params["ln_f"],
                                           eps=GCFG.layer_norm_epsilon))
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pp_forward_matches_clipcap(batch):
    params = init_clipcap(jax.random.key(1), CCFG, GCFG)
    ref = clipcap_forward(params, CCFG, GCFG, tokens=batch["tokens"],
                          clip_embed=batch["prefix"],
                          attribute_tokens=batch["attribute"])
    mesh = create_mesh({PIPE_AXIS: 4, DATA_AXIS: 2})
    pp_params = shard_clipcap_params_pp(mesh, params)
    # stage-sharded for real: leading layer axis split over pipe
    assert pp_params["gpt"]["blocks"]["attn"]["c_attn_w"].sharding.spec == \
        P(PIPE_AXIS)
    out = jax.jit(lambda p, b: clipcap_forward_pp(
        p, CCFG, GCFG, tokens=b["tokens"], clip_embed=b["prefix"],
        attribute_tokens=b["attribute"], mesh=mesh, microbatches=4))(
            pp_params, batch)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("axes,micro", [({PIPE_AXIS: 4, DATA_AXIS: 2}, 4),
                                        ({PIPE_AXIS: 2, DATA_AXIS: 2,
                                          "model": 2}, 2)])
def test_pp_train_step_matches_single_device(batch, axes, micro):
    """One full-finetune PP(xDP) train step: loss and updated params equal the
    single-device caption step (sgd(1.0) => param delta == gradient)."""
    params = init_clipcap(jax.random.key(2), CCFG, GCFG)
    tx = optax.sgd(1.0)

    mesh1 = create_mesh({DATA_AXIS: 1, "model": 1}, devices=jax.devices()[:1])
    step1 = make_caption_train_step(CCFG, GCFG, tx, mesh1)
    s1 = TrainState.create(jax.tree.map(jnp.copy, params), tx)
    s1, m1 = step1(s1, None, jax.tree.map(
        lambda x: jax.device_put(x, jax.devices()[0]), batch))

    mesh = create_mesh(axes)
    pp_params = shard_clipcap_params_pp(mesh, params)
    sp = TrainState.create(pp_params, tx)
    stepp = make_caption_train_step_pp(CCFG, GCFG, tx, mesh,
                                       microbatches=micro)
    sp, mp = stepp(sp, batch)

    np.testing.assert_allclose(float(mp["loss"]), float(m1["loss"]),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(sp.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=3e-5, atol=3e-5)


def test_pp_remat_matches(batch):
    """jax.checkpoint over the stage body (the GPipe stash-memory knob) must
    not change numerics."""
    params = init_clipcap(jax.random.key(3), CCFG, GCFG)
    mesh = create_mesh({PIPE_AXIS: 4, DATA_AXIS: 2})
    pp_params = shard_clipcap_params_pp(mesh, params)

    def loss(p, b, remat):
        logits = clipcap_forward_pp(
            p, CCFG, GCFG, tokens=b["tokens"], clip_embed=b["prefix"],
            attribute_tokens=b["attribute"], mesh=mesh, microbatches=4,
            remat=remat)
        return caption_loss(logits, b["tokens"], CCFG)

    g0 = jax.grad(lambda p: loss(p, batch, False))(pp_params)
    g1 = jax.grad(lambda p: loss(p, batch, True))(pp_params)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)

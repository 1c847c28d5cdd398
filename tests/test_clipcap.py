"""ClipCap stack: loss-slice semantics vs torch CE(ignore_index=0), mapper shapes,
frozen-LM training, multi-device step equivalence."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from construction_clip_tpu.core.configs import ClipCapConfig, GPT2Config
from construction_clip_tpu.models.clipcap import (
    init_clipcap, clipcap_forward, caption_loss, map_prefix)
from construction_clip_tpu.models.gpt2 import from_hf_state_dict


CCFG = ClipCapConfig(prefix_length=4, attribute_length=3, clip_dim=16,
                     mapper="mlp", only_prefix=True)
GCFG = GPT2Config.tiny()


@pytest.fixture(scope="module")
def stack():
    torch.manual_seed(2)
    hf = transformers.GPT2LMHeadModel(transformers.GPT2Config(
        vocab_size=GCFG.vocab_size, n_positions=GCFG.n_positions, n_embd=GCFG.n_embd,
        n_layer=GCFG.n_layer, n_head=GCFG.n_head)).eval()
    gpt_params = from_hf_state_dict(hf.state_dict(), GCFG)
    params = init_clipcap(jax.random.key(3), CCFG, GCFG, gpt_params=gpt_params)
    return hf, params


def test_mapper_shapes():
    params = init_clipcap(jax.random.key(0), CCFG, GCFG)
    out = map_prefix(params["mapper"], CCFG, GCFG, jnp.zeros((5, CCFG.clip_dim)))
    assert out.shape == (5, CCFG.prefix_length, GCFG.n_embd)

    tcfg = ClipCapConfig(prefix_length=4, attribute_length=3, clip_dim=16,
                         mapper="transformer", clip_length=2, mapper_layers=2)
    tp = init_clipcap(jax.random.key(0), tcfg, GCFG)
    out = map_prefix(tp["mapper"], tcfg, GCFG, jnp.zeros((5, 16)))
    assert out.shape == (5, 4, GCFG.n_embd)


def test_loss_slice_matches_torch(stack, rng):
    """Our caption_loss over clipcap logits == torch F.cross_entropy(ignore_index=0)
    on the reference's slice, with the same embeddings through the same GPT-2."""
    hf, params = stack
    B, T = 3, 8
    tokens = rng.integers(1, GCFG.vocab_size, (B, T)).astype(np.int64)
    tokens[0, 5:] = 0  # padded caption
    tokens[2, 3:] = 0
    prefix = rng.standard_normal((B, CCFG.clip_dim)).astype(np.float32)
    attr = rng.integers(1, GCFG.vocab_size, (B, CCFG.attribute_length)).astype(np.int64)

    logits = clipcap_forward(params, CCFG, GCFG, tokens=jnp.asarray(tokens.astype(np.int32)),
                             clip_embed=jnp.asarray(prefix),
                             attribute_tokens=jnp.asarray(attr.astype(np.int32)))
    ours = float(caption_loss(logits, jnp.asarray(tokens.astype(np.int32)), CCFG))

    # torch path: identical embeddings -> HF GPT-2 -> reference loss slice
    pj = np.asarray(map_prefix(params["mapper"], CCFG, GCFG, jnp.asarray(prefix)))
    with torch.no_grad():
        attr_emb = hf.transformer.wte(torch.from_numpy(attr))
        tok_emb = hf.transformer.wte(torch.from_numpy(tokens))
        cat = torch.cat([torch.from_numpy(pj), attr_emb, tok_emb], dim=1)
        tlogits = hf(inputs_embeds=cat).logits
        offset = CCFG.prefix_length + CCFG.attribute_length
        sl = tlogits[:, offset - 1: -1]
        ref = torch.nn.functional.cross_entropy(
            sl.reshape(-1, GCFG.vocab_size), torch.from_numpy(tokens).reshape(-1),
            ignore_index=0)
    np.testing.assert_allclose(ours, float(ref), rtol=1e-4)


def test_frozen_lm_training(stack, rng):
    """only_prefix: one step updates the mapper, leaves GPT-2 untouched, loss drops."""
    _, params = stack
    import optax

    from construction_clip_tpu.core.mesh import create_mesh, DATA_AXIS, MODEL_AXIS, \
        shard_batch, replicate
    from construction_clip_tpu.train.caption import make_caption_train_step
    from construction_clip_tpu.train.state import TrainState

    mesh = create_mesh({DATA_AXIS: 8, MODEL_AXIS: 1})
    tx = optax.adam(1e-3)
    step = make_caption_train_step(CCFG, GCFG, tx, mesh)

    B = 8
    batch = shard_batch(mesh, {
        "tokens": jnp.asarray(rng.integers(1, GCFG.vocab_size, (B, 8)).astype(np.int32)),
        "prefix": jnp.asarray(rng.standard_normal((B, CCFG.clip_dim)).astype(np.float32)),
        "attribute": jnp.asarray(rng.integers(1, GCFG.vocab_size, (B, 3)).astype(np.int32)),
    })
    mapper0 = jax.tree.map(jnp.copy, params["mapper"])
    gpt = replicate(mesh, params["gpt"])
    state = TrainState.create(replicate(mesh, jax.tree.map(jnp.copy, params["mapper"])), tx)
    losses = []
    for _ in range(4):
        state, m = step(state, gpt, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses
    changed = any(not np.allclose(np.asarray(a), np.asarray(b))
                  for a, b in zip(jax.tree.leaves(mapper0), jax.tree.leaves(state.params)))
    assert changed
    # frozen gpt identical
    for a, b in zip(jax.tree.leaves(params["gpt"]), jax.tree.leaves(gpt)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_full_finetune_updates_gpt(stack, rng):
    """only_prefix=False: the whole {mapper, gpt} tree trains."""
    _, params = stack
    import dataclasses
    import optax

    from construction_clip_tpu.core.mesh import create_mesh, DATA_AXIS, MODEL_AXIS, \
        shard_batch, replicate
    from construction_clip_tpu.train.caption import make_caption_train_step
    from construction_clip_tpu.train.state import TrainState

    full_cfg = dataclasses.replace(CCFG, only_prefix=False)
    mesh = create_mesh({DATA_AXIS: 8, MODEL_AXIS: 1})
    tx = optax.adam(1e-3)
    step = make_caption_train_step(full_cfg, GCFG, tx, mesh)

    B = 8
    batch = shard_batch(mesh, {
        "tokens": jnp.asarray(rng.integers(1, GCFG.vocab_size, (B, 8)).astype(np.int32)),
        "prefix": jnp.asarray(rng.standard_normal((B, CCFG.clip_dim)).astype(np.float32)),
        "attribute": jnp.asarray(rng.integers(1, GCFG.vocab_size, (B, 3)).astype(np.int32)),
    })
    gpt0 = jax.tree.map(jnp.copy, params["gpt"])
    state = TrainState.create(replicate(mesh, jax.tree.map(jnp.copy, params)), tx)
    losses = []
    for _ in range(3):
        state, m = step(state, None, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    changed = any(not np.allclose(np.asarray(a), np.asarray(b))
                  for a, b in zip(jax.tree.leaves(gpt0),
                                  jax.tree.leaves(state.params["gpt"])))
    assert changed, "GPT params did not update in full-finetune mode"


def test_dp_equals_single_device_uneven_padding(stack, rng):
    """Shards with different valid-token counts: DP loss AND update must equal
    single-device (global token mean, not pmean of per-shard means)."""
    import optax

    _, params = stack
    from construction_clip_tpu.core.mesh import (DATA_AXIS, MODEL_AXIS,
                                                 create_mesh, replicate,
                                                 shard_batch)
    from construction_clip_tpu.train.caption import make_caption_train_step
    from construction_clip_tpu.train.state import TrainState

    B = 8
    toks = rng.integers(1, GCFG.vocab_size, (B, 8)).astype(np.int32)
    toks[:4, 2:] = 0  # first half of the batch mostly padding
    batch = {
        "tokens": jnp.asarray(toks),
        "prefix": jnp.asarray(rng.standard_normal((B, CCFG.clip_dim)).astype(np.float32)),
        "attribute": jnp.asarray(rng.integers(1, GCFG.vocab_size, (B, 3)).astype(np.int32)),
    }
    tx = optax.sgd(0.1)  # linear in grads: well-conditioned equality check
    out = {}
    for n in (1, 4):
        mesh = create_mesh({DATA_AXIS: n, MODEL_AXIS: 1},
                           devices=jax.devices()[:n])
        step = make_caption_train_step(CCFG, GCFG, tx, mesh)
        gpt = replicate(mesh, params["gpt"])
        st = TrainState.create(
            replicate(mesh, jax.tree.map(jnp.copy, params["mapper"])), tx)
        st, m = step(st, gpt, shard_batch(mesh, batch))
        out[n] = (float(m["loss"]), st.params)
    np.testing.assert_allclose(out[1][0], out[4][0], rtol=1e-5)
    for a, b in zip(jax.tree.leaves(out[1][1]), jax.tree.leaves(out[4][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-5)

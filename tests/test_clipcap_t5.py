"""ClipCap-T5: loss-slice parity vs torch MT5 given identical prefix injection,
generation contract, multi-device train step."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from construction_clip_tpu.core.configs import ClipCapConfig, T5Config
from construction_clip_tpu.models.t5 import from_hf_state_dict, t5_encode
from construction_clip_tpu.models.clipcap.t5_model import (
    init_clipcap_t5, clipcap_t5_forward, t5_caption_loss, encode_with_prefix,
    _GptShapeShim)
from construction_clip_tpu.models.clipcap.model import map_prefix

TCFG = T5Config.tiny()
CCFG = ClipCapConfig(prefix_length=3, attribute_length=0, clip_dim=16,
                     mapper="mlp", only_prefix=True)


@pytest.fixture(scope="module")
def pair():
    hf_cfg = transformers.MT5Config(
        vocab_size=TCFG.vocab_size, d_model=TCFG.d_model, d_kv=TCFG.d_kv,
        d_ff=TCFG.d_ff, num_layers=TCFG.num_layers,
        num_decoder_layers=TCFG.num_decoder_layers, num_heads=TCFG.num_heads,
        tie_word_embeddings=False, dropout_rate=0.0)
    torch.manual_seed(8)
    hf = transformers.MT5ForConditionalGeneration(hf_cfg).eval()
    t5_params = from_hf_state_dict(hf.state_dict(), TCFG)
    params = init_clipcap_t5(jax.random.key(9), CCFG, TCFG, t5_params=t5_params)
    return hf, params


def test_loss_matches_torch_reference_semantics(pair, rng):
    """Same prefix-concat + dummy-decoder-prefix + loss slice as reference
    train_t5.py:229-245,357,371-372, computed through torch."""
    from transformers.modeling_outputs import BaseModelOutput

    hf, params = pair
    B, T = 2, 6
    ids = rng.integers(2, TCFG.vocab_size, (B, T)).astype(np.int64)
    ids[1, 4:] = 0
    mask = (ids != 0).astype(np.int64)
    clip_embed = rng.standard_normal((B, CCFG.clip_dim)).astype(np.float32)

    prefix = np.asarray(map_prefix(params["mapper"], CCFG, _GptShapeShim(TCFG.d_model),
                                   jnp.asarray(clip_embed)))
    with torch.no_grad():
        enc = hf.encoder(input_ids=torch.from_numpy(ids),
                         attention_mask=torch.from_numpy(mask)).last_hidden_state
        cat = torch.cat([torch.from_numpy(prefix), enc], dim=1)
        full_mask = torch.cat([torch.ones(B, CCFG.prefix_length, dtype=torch.long),
                               torch.from_numpy(mask)], dim=1)
        dec_in = torch.cat([torch.zeros(B, CCFG.prefix_length, dtype=torch.long),
                            torch.from_numpy(ids)], dim=1)
        out = hf(encoder_outputs=BaseModelOutput(last_hidden_state=cat),
                 attention_mask=full_mask, decoder_input_ids=dec_in)
        sl = out.logits[:, CCFG.prefix_length - 1: -1]
        ref = torch.nn.functional.cross_entropy(
            sl.reshape(-1, TCFG.vocab_size), torch.from_numpy(ids).reshape(-1),
            ignore_index=0)

    logits = clipcap_t5_forward(params, CCFG, TCFG,
                                input_ids=jnp.asarray(ids.astype(np.int32)),
                                attention_mask=jnp.asarray(mask.astype(np.int32)),
                                clip_embed=jnp.asarray(clip_embed))
    ours = float(t5_caption_loss(logits, jnp.asarray(ids.astype(np.int32)), CCFG))
    np.testing.assert_allclose(ours, float(ref), rtol=2e-4)


def test_t5_generate(pair, rng):
    from construction_clip_tpu.infer.decode_t5 import t5_generate

    _, params = pair
    ids = jnp.asarray(rng.integers(2, TCFG.vocab_size, (2, 5)).astype(np.int32))
    mask = jnp.ones((2, 5), jnp.int32)
    hidden, full_mask = encode_with_prefix(
        params, CCFG, TCFG, input_ids=ids, attention_mask=mask,
        clip_embed=jnp.asarray(rng.standard_normal((2, CCFG.clip_dim)).astype(np.float32)))
    res = t5_generate(params["t5"], TCFG, hidden, key=jax.random.key(1),
                      encoder_mask=full_mask, max_steps=8, do_sample=True, top_p=0.9)
    assert res.tokens.shape == (2, 8)
    res2 = t5_generate(params["t5"], TCFG, hidden, key=jax.random.key(1),
                       encoder_mask=full_mask, max_steps=8, do_sample=True, top_p=0.9)
    np.testing.assert_array_equal(np.asarray(res.tokens), np.asarray(res2.tokens))
    greedy = t5_generate(params["t5"], TCFG, hidden, encoder_mask=full_mask,
                         max_steps=8, do_sample=False)
    assert greedy.tokens.shape == (2, 8)


def test_t5_train_step_multidevice(pair, rng):
    import optax

    from construction_clip_tpu.core.mesh import (
        create_mesh, DATA_AXIS, MODEL_AXIS, shard_batch, replicate)
    from construction_clip_tpu.train.t5 import make_t5_caption_train_step
    from construction_clip_tpu.train.state import TrainState

    _, params = pair
    mesh = create_mesh({DATA_AXIS: 8, MODEL_AXIS: 1})
    tx = optax.adam(2e-3)
    step = make_t5_caption_train_step(CCFG, TCFG, tx, mesh)

    B = 8
    ids = rng.integers(2, TCFG.vocab_size, (B, 6)).astype(np.int32)
    batch = shard_batch(mesh, {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.asarray((ids != 0).astype(np.int32)),
        "prefix": jnp.asarray(rng.standard_normal((B, CCFG.clip_dim)).astype(np.float32)),
    })
    frozen = replicate(mesh, params["t5"])
    state = TrainState.create(replicate(mesh, jax.tree.map(jnp.copy, params["mapper"])), tx)
    losses = []
    for _ in range(4):
        state, m = step(state, frozen, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses


def test_t5_dp_equals_single_device_uneven_padding(pair, rng):
    """Shards with different valid-token counts: DP loss and update must equal
    single-device (global token mean; see train/t5.py)."""
    import optax

    from construction_clip_tpu.core.mesh import (
        create_mesh, DATA_AXIS, MODEL_AXIS, shard_batch, replicate)
    from construction_clip_tpu.train.t5 import make_t5_caption_train_step
    from construction_clip_tpu.train.state import TrainState

    _, params = pair
    B = 8
    ids = rng.integers(2, TCFG.vocab_size, (B, 6)).astype(np.int32)
    ids[:4, 2:] = 0  # first half mostly padding
    batch = {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.asarray((ids != 0).astype(np.int32)),
        "prefix": jnp.asarray(rng.standard_normal((B, CCFG.clip_dim)).astype(np.float32)),
    }
    tx = optax.sgd(0.1)
    out = {}
    for n in (1, 4):
        mesh = create_mesh({DATA_AXIS: n, MODEL_AXIS: 1},
                           devices=jax.devices()[:n])
        step = make_t5_caption_train_step(CCFG, TCFG, tx, mesh)
        frozen = replicate(mesh, params["t5"])
        st = TrainState.create(
            replicate(mesh, jax.tree.map(jnp.copy, params["mapper"])), tx)
        st, m = step(st, frozen, shard_batch(mesh, batch))
        out[n] = (float(m["loss"]), st.params)
    np.testing.assert_allclose(out[1][0], out[4][0], rtol=1e-5)
    for a, b in zip(jax.tree.leaves(out[1][1]), jax.tree.leaves(out[4][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-5)

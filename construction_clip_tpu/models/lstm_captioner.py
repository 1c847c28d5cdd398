"""Show-attend-tell captioner: Bahdanau attention + LSTM decoder over a frozen CNN
feature grid.

Reference (reference attention_model/model.py):
  - Attention :31-60: score = A(tanh(U(features) + W(h))), softmax over the 49
    positions, context = sum(alpha * features).
  - DecoderRNN :64-173: LSTMCell over [word_embed ‖ context], h/c initialised from
    linear maps of the MEAN feature (:169-173), logits = fcn(dropout(h)); the f_beta
    gate is DEFINED but never used in forward (:83) — reproduced by omission.
  - Teacher-forced forward :92-119 (seq_length = len(captions)-1), greedy
    generate_caption :121-166 returning per-step alphas for the 7x7 overlays.

TPU form: teacher forcing is a lax.scan over time; greedy decode a lax.while_loop;
gate math matches torch.nn.LSTMCell (i,f,g,o gate order) so converted weights are
bit-compatible.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _linear_init(key, i, o, dtype):
    # torch nn.Linear default: U(-1/sqrt(i), 1/sqrt(i)) for both weight and bias
    k1, k2 = jax.random.split(key)
    bound = 1.0 / (i ** 0.5)
    return {"w": jax.random.uniform(k1, (i, o), dtype, -bound, bound),
            "b": jax.random.uniform(k2, (o,), dtype, -bound, bound)}


def init_lstm_captioner(key, *, vocab_size: int, embed_size: int = 300,
                        attention_dim: int = 256, encoder_dim: int = 2048,
                        decoder_dim: int = 512, dtype=jnp.float32,
                        embeddings: Optional[jax.Array] = None):
    ks = iter(jax.random.split(key, 12))
    lstm_in = embed_size + encoder_dim
    bound = 1.0 / (decoder_dim ** 0.5)
    return {
        "embedding": embeddings if embeddings is not None else
        (jax.random.normal(next(ks), (vocab_size, embed_size)) * 0.1).astype(dtype),
        "att_W": _linear_init(next(ks), decoder_dim, attention_dim, dtype),
        "att_U": _linear_init(next(ks), encoder_dim, attention_dim, dtype),
        "att_A": _linear_init(next(ks), attention_dim, 1, dtype),
        "init_h": _linear_init(next(ks), encoder_dim, decoder_dim, dtype),
        "init_c": _linear_init(next(ks), encoder_dim, decoder_dim, dtype),
        # torch LSTMCell layout: w_ih [in, 4H], w_hh [H, 4H] (stored input-major)
        "w_ih": jax.random.uniform(next(ks), (lstm_in, 4 * decoder_dim), dtype, -bound, bound),
        "b_ih": jax.random.uniform(next(ks), (4 * decoder_dim,), dtype, -bound, bound),
        "w_hh": jax.random.uniform(next(ks), (decoder_dim, 4 * decoder_dim), dtype, -bound, bound),
        "b_hh": jax.random.uniform(next(ks), (4 * decoder_dim,), dtype, -bound, bound),
        "fcn": _linear_init(next(ks), decoder_dim, vocab_size, dtype),
    }


def _lin(p, x):
    return x @ p["w"] + p["b"]


def attention(params, features, h):
    """features [B,N,enc], h [B,dec] -> (alpha [B,N], context [B,enc])."""
    u = _lin(params["att_U"], features)                       # [B,N,att]
    w = _lin(params["att_W"], h)                              # [B,att]
    scores = _lin(params["att_A"], jnp.tanh(u + w[:, None]))[..., 0]  # [B,N]
    alpha = jax.nn.softmax(scores, axis=1)
    context = jnp.sum(features * alpha[..., None], axis=1)
    return alpha, context


def _lstm_cell(params, x, h, c):
    gates = x @ params["w_ih"] + params["b_ih"] + h @ params["w_hh"] + params["b_hh"]
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h = jax.nn.sigmoid(o) * jnp.tanh(c)
    return h, c


def init_state(params, features):
    mean = features.mean(axis=1)
    return _lin(params["init_h"], mean), _lin(params["init_c"], mean)


def captioner_forward(params, features, captions, *, dropout_rate: float = 0.0,
                      rng: Optional[jax.Array] = None):
    """Teacher-forced: features [B,N,enc], captions [B,T] ->
    (logits [B,T-1,V], alphas [B,T-1,N])."""
    embeds = params["embedding"][captions]        # [B,T,E]
    h, c = init_state(params, features)

    def step(carry, emb_t):
        h, c, rng = carry
        alpha, context = attention(params, features, h)
        h, c = _lstm_cell(params, jnp.concatenate([emb_t, context], axis=-1), h, c)
        out = h
        if dropout_rate > 0.0 and rng is not None:
            rng, sub = jax.random.split(rng)
            keep = jax.random.bernoulli(sub, 1.0 - dropout_rate, out.shape)
            out = jnp.where(keep, out / (1.0 - dropout_rate), 0.0)
        logits = _lin(params["fcn"], out)
        return (h, c, rng), (logits, alpha)

    (h, c, _), (logits, alphas) = jax.lax.scan(
        step, (h, c, rng if rng is not None else jax.random.key(0)),
        embeds[:, :-1].transpose(1, 0, 2))
    return logits.transpose(1, 0, 2), alphas.transpose(1, 0, 2)


def caption_lm_loss_parts(logits, captions, *, pad_id: int = 0):
    """(sum of masked token NLL, number of valid tokens) — the pieces of the
    global token-mean CE. Kept separate so data-parallel shards can psum BOTH
    before dividing: shards carry different amounts of padding, and a pmean of
    per-shard means would upweight short-caption shards vs the reference's
    single-device objective."""
    targets = captions[:, 1:]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    mask = (targets != pad_id).astype(jnp.float32)
    return jnp.sum(nll * mask), jnp.sum(mask)


def caption_lm_loss(logits, captions, *, pad_id: int = 0):
    """CE of logits[:, s] vs captions[:, s+1] (reference train.py:149-150 targets
    captions[:,1:]), padding masked."""
    total, count = caption_lm_loss_parts(logits, captions, pad_id=pad_id)
    return total / jnp.maximum(count, 1.0)


def generate_caption(params, features, *, sos_id: int, eos_id: int,
                     max_len: int = 20):
    """Greedy decode (reference generate_caption :121-166).
    features [B,N,enc] -> (tokens [B,max_len], lengths [B], alphas [B,max_len,N])."""
    b, n, _ = features.shape
    h, c = init_state(params, features)
    emb = params["embedding"][jnp.full((b,), sos_id)]

    def cond(s):
        t, _, done, *_ = s
        return (t < max_len) & ~jnp.all(done)

    def body(s):
        t, toks, done, h, c, emb, alphas = s
        alpha, context = attention(params, features, h)
        h, c = _lstm_cell(params, jnp.concatenate([emb, context], axis=-1), h, c)
        logits = _lin(params["fcn"], h)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, 0, nxt)
        toks = toks.at[:, t].set(nxt)
        alphas = alphas.at[:, t].set(alpha)
        done = done | (nxt == eos_id)
        return t + 1, toks, done, h, c, params["embedding"][nxt], alphas

    init = (jnp.zeros((), jnp.int32), jnp.zeros((b, max_len), jnp.int32),
            jnp.zeros((b,), bool), h, c, emb, jnp.zeros((b, max_len, n)))
    _, toks, done, _, _, _, alphas = jax.lax.while_loop(cond, body, init)
    lengths = jnp.where(jnp.any(toks == eos_id, axis=-1),
                        jnp.argmax(toks == eos_id, axis=-1) + 1, max_len)
    return toks, lengths, alphas


def from_torch_state_dict(sd, *, vocab_size: int):
    """Converter for a torch DecoderRNN state_dict (reference attention_model layout)."""
    import numpy as np

    def a(k):
        x = sd[k]
        if hasattr(x, "detach"):
            x = x.detach().cpu().numpy()
        return np.asarray(x)

    def lin(prefix):
        return {"w": jnp.asarray(a(f"{prefix}.weight").T),
                "b": jnp.asarray(a(f"{prefix}.bias"))}

    return {
        "embedding": jnp.asarray(a("embedding.weight")),
        "att_W": lin("attention.W"), "att_U": lin("attention.U"),
        "att_A": lin("attention.A"),
        "init_h": lin("init_h"), "init_c": lin("init_c"),
        "w_ih": jnp.asarray(a("lstm_cell.weight_ih").T),
        "b_ih": jnp.asarray(a("lstm_cell.bias_ih")),
        "w_hh": jnp.asarray(a("lstm_cell.weight_hh").T),
        "b_hh": jnp.asarray(a("lstm_cell.bias_hh")),
        "fcn": lin("fcn"),
    }

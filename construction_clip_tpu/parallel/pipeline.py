"""Pipeline parallelism: GPipe-style microbatch schedule over a mesh axis.

The reference trains everything on one GPU (`torch.device('cuda:0')`,
reference CLIP/train.py:103); PP is the scaling axis it never had — it
completes this framework's §2d set (DP / TP / PP) so the caption-LM trainer
can span chips whose HBM a full replica would not fit.

Design (TPU-first, not a torch-pipe translation):

  * The mesh axis "pipe" holds S stages; the transformer's layer-stacked
    params (leading L axis, the repo-wide convention) are sharded
    `P("pipe")` — stage s owns layers [s*L/S, (s+1)*L/S). No parameter ever
    moves; only [mb, T, D] activations cross stages, via `jax.lax.ppermute`
    over ICI.
  * The batch is split into M microbatches. One `lax.scan` runs
    M + S - 1 ticks; at tick t, stage 0 feeds microbatch t (while t < M)
    and every other stage transforms what arrived from its predecessor the
    previous tick. The last stage's outputs land in an [M, mb, T, D] buffer
    through a masked dynamic write, so the bubble ticks' garbage is never
    observed. Bubble fraction: (S-1)/(M+S-1).
  * Backward is jax.grad THROUGH the pipelined forward: ppermute transposes
    to the reverse permute and the masked writes transpose to masked reads,
    so the backward replays the same schedule in reverse — GPipe semantics
    (full activation stash across the scan; `jax.checkpoint` the stage_fn
    to trade recompute for stash memory). A 1F1B/interleaved schedule needs
    a hand-written VJP pairing fwd/bwd ticks; measured at this repo's model
    sizes the stash fits comfortably, so GPipe-by-autodiff is the shipped
    design and 1F1B is documented as the scale-up path.
  * Numerics: the stage applies the SAME block function as the single-device
    scan (models/gpt2.apply_block_uncached), and every tick's compute is
    identical math on identical fp values — PP loss/grads equal the
    single-device ones exactly (tests/test_pipeline_parallel.py pins both,
    and the driver dryrun runs a PP(4)xDP(2) caption step).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

PIPE_AXIS = "pipe"


def pipeline_apply(stage_fn, stage_params, x_micro, *, axis: str = PIPE_AXIS):
    """Run the GPipe schedule INSIDE shard_map over `axis`.

    stage_fn(stage_params, h) -> h: applies this stage's layer slice to one
      microbatch [mb, ...] (shape-preserving).
    stage_params: this stage's shard (leading layer axis already sliced by
      the shard_map in_spec).
    x_micro: [M, mb, ...] microbatched input, replicated over `axis`; only
      stage 0 reads it.

    Returns [M, mb, ...]: the LAST stage's outputs, replicated over `axis`
    (one masked psum at the end).
    """
    S = jax.lax.axis_size(axis)
    sid = jax.lax.axis_index(axis)
    M = x_micro.shape[0]
    mb_shape = x_micro.shape[1:]
    dtype = x_micro.dtype

    def tick(carry, t):
        recv, outputs = carry
        # stage 0 reads microbatch t from the feed; later stages read what
        # the predecessor ppermuted in last tick. Bubble ticks (t >= M at
        # stage 0; t < sid elsewhere) compute garbage that the masked write
        # below never observes — and whose cotangent is therefore zero.
        feed = jax.lax.dynamic_index_in_dim(
            x_micro, jnp.clip(t, 0, M - 1), 0, keepdims=False)
        inp = jnp.where(sid == 0, feed, recv)
        out = stage_fn(stage_params, inp)
        m = t - (S - 1)                      # microbatch index at last stage
        mc = jnp.clip(m, 0, M - 1)
        write = (sid == S - 1) & (m >= 0) & (m < M)
        cur = jax.lax.dynamic_index_in_dim(outputs, mc, 0, keepdims=False)
        outputs = jax.lax.dynamic_update_slice_in_dim(
            outputs, jnp.where(write, out, cur).astype(dtype)[None], mc, 0)
        # hand this tick's output to the next stage (stage S-1 sends nowhere;
        # stage 0 receives zeros — its input comes from the feed)
        recv = jax.lax.ppermute(out, axis,
                                [(s, s + 1) for s in range(S - 1)])
        return (recv, outputs), None

    outputs0 = jnp.zeros((M,) + tuple(mb_shape), dtype)
    recv0 = jnp.zeros(mb_shape, dtype)
    (_, outputs), _ = jax.lax.scan(tick, (recv0, outputs0),
                                   jnp.arange(M + S - 1))
    # outputs are only real on the last stage; replicate them so the loss
    # (and its grad wrt every replicated leaf) is identical on all stages
    return jax.lax.psum(jnp.where(sid == S - 1, outputs, 0.0), axis)


def pipelined_blocks(blocks, x, attn_bias, cfg, mesh: Mesh, *,
                     microbatches: int, axis: str = PIPE_AXIS,
                     remat: bool = False, dp_axis: str | None = None):
    """Apply a layer-stacked GPT-2 block tree [L, ...] to x [B, T, D] through
    the pipeline: blocks sharded P(axis) on L, batch split into
    `microbatches`. Returns [B, T, D]. Call OUTSIDE shard_map (this wraps
    its own); embeddings/head/loss stay replicated ordinary jit ops around
    it, and jax.grad flows through.

    dp_axis: optional data axis name — x is additionally sharded over it
    (PP x DP composition; each data shard runs its own pipeline flow over
    the same stage-sharded weights).
    """
    from construction_clip_tpu.models.gpt2 import apply_block_uncached

    b, t, d = x.shape
    m = microbatches
    if b % m:
        raise ValueError(f"batch {b} not divisible by {m} microbatches")
    n_layer = jax.tree.leaves(blocks)[0].shape[0]
    if n_layer % mesh.shape[axis]:
        raise ValueError(f"{n_layer} layers not divisible by "
                         f"pipe={mesh.shape[axis]}")

    def stage(stage_blocks, h):
        def body(carry, lp):
            out, _ = apply_block_uncached(lp, carry, attn_bias, cfg)
            return out, None
        if remat:
            body = jax.checkpoint(body)
        out, _ = jax.lax.scan(body, h, stage_blocks)
        return out

    def inner(stage_blocks, x_micro):
        return pipeline_apply(functools.partial(stage),
                              stage_blocks, x_micro, axis=axis)

    batch_spec = P(None, dp_axis) if dp_axis else P()
    sharded = shard_map(
        inner, mesh=mesh,
        in_specs=(P(axis), batch_spec),
        out_specs=batch_spec,
        check_vma=False,
    )
    x_micro = x.reshape(m, b // m, t, d)
    out = sharded(blocks, x_micro)
    return out.reshape(b, t, d)

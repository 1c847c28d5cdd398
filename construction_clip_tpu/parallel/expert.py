"""Expert parallelism: a mixture-of-experts FFN sharded over an "expert" mesh
axis, tokens exchanged with `all_to_all` over ICI.

The reference trains everything on one GPU (`torch.device('cuda:0')`,
reference CLIP/train.py:103) and has no MoE; EP is the last §2d scaling
strategy this framework supplies as a first-class component (DP
parallel/infonce.py, TP parallel/sharding.py, PP parallel/pipeline.py,
SP ring demo ops/pallas_collectives.py). None of this repo's model families
needs sparse FFNs at their sizes, so — like the SP ring kernel — this is the
production-shaped demo of the strategy: a GShard/Switch-style top-1 routed
FFN whose expert weights never leave their device.

Design (TPU-first):

  * The mesh axis "expert" holds Ed devices; E experts (E % Ed == 0) live
    stacked on a leading axis sharded `P("expert")` — each device owns
    E/Ed experts. The router projection is tiny and stays replicated.
  * Tokens are grouped by device (the batch is sharded over the same axis,
    GShard's "groups"): each device routes its S local tokens with top-1
    gating into fixed-capacity slots (C per expert per group — static shapes
    for XLA; overflow tokens are dropped by zeroing their gate, the standard
    capacity-factor semantics).
  * Dispatch is one einsum to [E, C, D], then ONE `all_to_all` over ICI
    re-buckets by expert owner; the local [E/Ed, Ed*C, D] batch runs through
    the owned experts as large MXU matmuls; the reverse all_to_all + combine
    einsum returns gated outputs to the tokens' home devices.
  * Numerics: with capacity >= S no token drops and the EP output equals the
    dense (single-device, gather-per-token) reference to fp32 tolerance;
    grads flow through the einsum dispatch/combine and the collectives
    (tests/test_expert_parallel.py pins forward and grads, EP and EP x DP).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from construction_clip_tpu.ops.activations import gelu_new as gelu

EXPERT_AXIS = "expert"


def init_moe(key, d_model: int, d_ff: int, n_experts: int):
    """MoE FFN params: replicated router + expert-stacked in/out projections
    (input-major [in, out], the repo-wide convention; experts on a leading E
    axis so `P(EXPERT_AXIS)` shards them exactly like layer stacks shard over
    "pipe")."""
    kr, ki, ko = jax.random.split(key, 3)
    s_in = d_model ** -0.5
    s_out = d_ff ** -0.5
    return {
        "router": jax.random.normal(kr, (d_model, n_experts), jnp.float32) * s_in,
        "w_in": jax.random.normal(ki, (n_experts, d_model, d_ff), jnp.float32) * s_in,
        "b_in": jnp.zeros((n_experts, d_ff), jnp.float32),
        "w_out": jax.random.normal(ko, (n_experts, d_ff, d_model), jnp.float32) * s_out,
        "b_out": jnp.zeros((n_experts, d_model), jnp.float32),
    }


def _route(x, router, n_experts: int, capacity: int):
    """Top-1 routing for one group of S tokens: returns (dispatch [S, E, C],
    gate [S]) with the first-come-first-served capacity rule (token order =
    position order, the Switch/GShard tie-break)."""
    logits = x @ router                                   # [S, E]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    expert = jnp.argmax(probs, axis=-1)                   # [S]
    gate = jnp.take_along_axis(probs, expert[:, None], axis=-1)[:, 0]
    onehot = jax.nn.one_hot(expert, n_experts, dtype=jnp.float32)  # [S, E]
    # position of each token within its expert's queue (0-based)
    pos = jnp.cumsum(onehot, axis=0) * onehot - onehot    # [S, E]
    pos = jnp.sum(pos, axis=-1).astype(jnp.int32)         # [S]
    keep = pos < capacity
    dispatch = (onehot * keep[:, None].astype(jnp.float32))[:, :, None] \
        * jax.nn.one_hot(pos, capacity, dtype=jnp.float32)[:, None, :]
    return dispatch, gate * keep.astype(jnp.float32)


def moe_ffn_dense(params, x, *, capacity: int | None = None):
    """Single-device reference: the same top-1 routed FFN computed with a
    per-token weight gather — the semantics EP must reproduce."""
    b, t, d = x.shape
    tokens = x.reshape(b * t, d)
    n_experts = params["router"].shape[-1]
    capacity = capacity if capacity is not None else b * t
    dispatch, gate = _route(tokens, params["router"], n_experts, capacity)
    expert = jnp.argmax(dispatch.sum(-1), axis=-1)        # [S] (0 if dropped)
    kept = dispatch.sum((1, 2)) > 0                       # [S]
    w_in = params["w_in"][expert]                         # [S, D, F]
    w_out = params["w_out"][expert]
    h = gelu(jnp.einsum("sd,sdf->sf", tokens, w_in) + params["b_in"][expert])
    y = jnp.einsum("sf,sfd->sd", h, w_out) + params["b_out"][expert]
    y = y * (gate * kept.astype(jnp.float32))[:, None]
    return y.reshape(b, t, d)


def moe_ffn_ep(params, x, mesh: Mesh, *, capacity_factor: float = 1.0,
               axis: str = EXPERT_AXIS, dp_axis: str | None = None):
    """Expert-parallel MoE FFN: x [B, T, D] with the token batch sharded over
    `axis` (and optionally `dp_axis`), expert params sharded P(axis) on E.
    Call OUTSIDE shard_map (this wraps its own); jax.grad flows through.

    capacity_factor: C = ceil(S * capacity_factor / E) slots per expert per
    group. >= E guarantees no drops (parity with the dense reference)."""
    ed = mesh.shape[axis]
    n_groups = ed * (mesh.shape[dp_axis] if dp_axis else 1)
    b, t, d = x.shape
    if (b * t) % n_groups:
        raise ValueError(f"{b * t} tokens not divisible by {n_groups} groups")
    n_experts = params["router"].shape[-1]
    if n_experts % ed:
        raise ValueError(f"{n_experts} experts not divisible by expert={ed}")
    e_local = n_experts // ed
    s = (b * t) // n_groups
    capacity = -(-int(s * capacity_factor) // n_experts)  # ceil

    def local(router, w_in, b_in, w_out, b_out, xg):
        # xg: this group's tokens [S, D]; w_*: this device's experts [E/Ed, ...]
        dispatch, gate = _route(xg, router, n_experts, capacity)
        xe = jnp.einsum("sec,sd->ecd", dispatch, xg)      # [E, C, D]
        # re-bucket by owner: row-block j goes to device j, which ends up
        # holding every group's slots for its own e_local experts
        xe = jax.lax.all_to_all(
            xe.reshape(ed, e_local * capacity, d), axis,
            split_axis=0, concat_axis=0, tiled=True)      # [Ed*elC, D] blocks
        xe = xe.reshape(ed, e_local, capacity, d).transpose(1, 0, 2, 3) \
               .reshape(e_local, ed * capacity, d)
        h = gelu(jnp.einsum("ecd,edf->ecf", xe, w_in) + b_in[:, None, :])
        ye = jnp.einsum("ecf,efd->ecd", h, w_out) + b_out[:, None, :]
        ye = ye.reshape(e_local, ed, capacity, d).transpose(1, 0, 2, 3) \
               .reshape(ed, e_local * capacity, d)
        ye = jax.lax.all_to_all(ye, axis, split_axis=0, concat_axis=0,
                                tiled=True)
        ye = ye.reshape(n_experts, capacity, d)
        return jnp.einsum("sec,ecd,s->sd", dispatch, ye, gate)

    token_spec = P(axis) if dp_axis is None else P((dp_axis, axis))
    sharded = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), token_spec),
        out_specs=token_spec,
        check_vma=False,
    )
    y = sharded(params["router"], params["w_in"], params["b_in"],
                params["w_out"], params["b_out"], x.reshape(b * t, d))
    return y.reshape(b, t, d)

"""Ring all-gather as a Pallas TPU kernel — the hand-rolled ICI collective.

XLA's `jax.lax.all_gather` is what production paths use (parallel/infonce.py); this
kernel exists as the framework's explicit-RDMA implementation of the same collective
(bidirectional nearest-neighbor `make_async_remote_copy` ring, one chunk per step,
the pattern from the TPU kernel playbook) — the building block for overlapping
communication with compute in future fused contrastive kernels.

Layout: each device holds x [chunk, D]; output [n_dev * chunk, D]. Device d sends its
accumulated chunks clockwise; after n-1 steps everyone holds everything.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ring_kernel(x_ref, out_ref, comm_buf, send_sem, recv_sem, *, axis: str):
    n = jax.lax.axis_size(axis)
    my = jax.lax.axis_index(axis)
    chunk = x_ref.shape[0]

    # local chunk into place
    out_ref[pl.ds(my * chunk, chunk), :] = x_ref[:]
    comm_buf[0] = x_ref[:]

    def step(i, _):
        send_slot = i % 2
        recv_slot = (i + 1) % 2
        dst = jax.lax.rem(my + 1, n)
        rdma = pltpu.make_async_remote_copy(
            src_ref=comm_buf.at[send_slot],
            dst_ref=comm_buf.at[recv_slot],
            send_sem=send_sem.at[send_slot],
            recv_sem=recv_sem.at[recv_slot],
            device_id=dst,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        rdma.start()
        rdma.wait()
        # the chunk that just arrived originated at (my - i - 1) mod n
        src_dev = jax.lax.rem(my - i - 1 + n, n)
        out_ref[pl.ds(src_dev * chunk, chunk), :] = comm_buf[recv_slot]
        return _

    jax.lax.fori_loop(0, n - 1, step, None)


def ring_all_gather(x, *, axis: str, interpret: bool = False):
    """Inside shard_map over `axis`: x [chunk, D] -> [n*chunk, D] (tiled gather)."""
    n = jax.lax.axis_size(axis)
    chunk, d = x.shape
    return pl.pallas_call(
        functools.partial(_ring_kernel, axis=axis),
        out_shape=jax.ShapeDtypeStruct((n * chunk, d), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, d), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True,
                                             collective_id=7),
        interpret=interpret,
    )(x)

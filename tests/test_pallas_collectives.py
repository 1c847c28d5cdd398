"""Ring all-gather Pallas kernel vs jax.lax.all_gather, interpret mode over a
virtual device mesh (remote DMAs simulated on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from construction_clip_tpu.ops.pallas_collectives import ring_all_gather


@pytest.mark.parametrize("n_dev,chunk,d", [(4, 2, 8), (8, 1, 16)])
def test_ring_all_gather_matches_lax(n_dev, chunk, d, rng):
    if len(jax.devices()) < n_dev:
        pytest.skip("not enough virtual devices")
    mesh = Mesh(np.asarray(jax.devices()[:n_dev]).reshape(n_dev), ("x",))
    x = jnp.asarray(rng.standard_normal((n_dev * chunk, d)).astype(np.float32))

    ours = shard_map(lambda s: ring_all_gather(s, axis="x", interpret=True),
                     mesh=mesh, in_specs=P("x"), out_specs=P(None),
                     check_vma=False)(x)
    ref = shard_map(lambda s: jax.lax.all_gather(s, "x", tiled=True),
                    mesh=mesh, in_specs=P("x"), out_specs=P(None),
                    check_vma=False)(x)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref))
    np.testing.assert_allclose(np.asarray(ours), np.asarray(x))

"""Mixed-precision policy.

TPU MXU wants bfloat16 operands; params and optimizer state stay float32.
The reference trains in whatever torch defaults to (fp32, with a fp16-on-CUDA hack in
clip.load) — here precision is an explicit, global policy threaded through model apply
functions.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.float32
    # dtype for softmax/layernorm accumulations and final logits
    output_dtype: jnp.dtype = jnp.float32

    def cast_to_compute(self, tree):
        import jax

        return jax.tree.map(
            lambda x: x.astype(self.compute_dtype)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )

    def cast_to_output(self, x):
        return x.astype(self.output_dtype)


DEFAULT_POLICY = Policy()
BF16_POLICY = Policy(compute_dtype=jnp.bfloat16)


def policy_from_name(name: str) -> Policy:
    """'auto' picks the backend-native compute dtype: bf16 on TPU (MXU-native,
    and the only chip-validated beam-decode config — fp32 beam decode at B=16
    reproducibly crashes the TPU worker, a backend fault bisected in round 4:
    bf16 B=16 OK, fp32 B=8 OK, fp32 B=16 worker crash), fp32 on CPU where the
    parity tests run."""
    if name == "auto":
        import jax

        return BF16_POLICY if jax.default_backend() == "tpu" else DEFAULT_POLICY
    return {"float32": DEFAULT_POLICY, "fp32": DEFAULT_POLICY,
            "bfloat16": BF16_POLICY, "bf16": BF16_POLICY}[name]

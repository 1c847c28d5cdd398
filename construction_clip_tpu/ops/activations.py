"""Activation functions matching the exact variants the reference's backbones use.

- quick_gelu: x * sigmoid(1.702 x) — OpenAI CLIP's activation.
- gelu_new:   tanh-approximated GELU — GPT-2's activation (HF "gelu_new").
- gelu_gated: GELU-gated feedforward halves — mT5's gated act.

All are elementwise VPU ops; XLA fuses them into the surrounding matmuls, so they stay
as jnp expressions rather than Pallas kernels.
"""

from __future__ import annotations

import jax.numpy as jnp


def quick_gelu(x):
    return x * jnp.reciprocal(1.0 + jnp.exp(-1.702 * x))


def gelu_new(x):
    # 0.5 x (1 + tanh(sqrt(2/pi) (x + 0.044715 x^3))) — matches HF gelu_new bit pattern
    c = 0.7978845608028654  # sqrt(2/pi)
    return 0.5 * x * (1.0 + jnp.tanh(c * (x + 0.044715 * x * x * x)))


def gelu_gated(gate, up):
    return gelu_new(gate) * up

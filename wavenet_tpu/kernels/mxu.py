"""MXU matmul precision discipline for Mosaic kernels.

Measured on TPU v5-lite (tools/r2_sampler_stress.py investigation,
round 2): inside a Pallas kernel, ``jnp.dot`` at DEFAULT precision runs
ONE bf16 MXU pass even for float32 operands — max|err| 2.2e-1 on a
K=256 random matmul vs 7.6e-6 with ``precision=HIGHEST``. Outside
kernels, XLA compiles f32 matmuls to exact-f32 passes at DEFAULT on
this platform, so a kernel that claims f32 parity with the XLA model
MUST request HIGHEST explicitly; bf16 operands are MXU-native and take
a single pass either way.

Every matmul in wavenet_tpu's kernels goes through :func:`mxu_dot` so
the rule lives in one place.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def mxu_dot(a, b):
    """``a @ b`` with f32 accumulation and dtype-true multiply passes.

    f32 x f32 -> exact f32 (HIGHEST: bf16 multi-pass decomposition);
    bf16 operands -> native single pass. Mixed operands follow the
    wider input.
    """
    prec = (lax.Precision.HIGHEST
            if (a.dtype == jnp.float32 or b.dtype == jnp.float32)
            else lax.Precision.DEFAULT)
    return jnp.dot(a, b, precision=prec,
                   preferred_element_type=jnp.float32)


def _prec(a, b):
    return (lax.Precision.HIGHEST
            if (a.dtype == jnp.float32 or b.dtype == jnp.float32)
            else lax.Precision.DEFAULT)


def mxu_dot_tA(a, b):
    """``a.T @ b`` without materializing the transpose.

    Contracts dim 0 of both operands ([K, M] x [K, N] -> [M, N]) through
    dot_general dimension numbers — a ``.T`` in front of a Mosaic dot
    lowers to a real VMEM transpose (lane/sublane shuffles over the
    whole buffer), which for the [Tt, C] weight-gradient matmuls costs
    more than the matmul itself.
    """
    return lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                           precision=_prec(a, b),
                           preferred_element_type=jnp.float32)


def mxu_dot_tB(a, b):
    """``a @ b.T`` without materializing the transpose
    ([M, K] x [N, K] -> [M, N])."""
    return lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                           precision=_prec(a, b),
                           preferred_element_type=jnp.float32)


__all__ = ["mxu_dot", "mxu_dot_tA", "mxu_dot_tB"]

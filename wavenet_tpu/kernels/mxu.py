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


__all__ = ["mxu_dot"]

"""Shared weight packing for the fused dilated-stack training kernels.

Every fused-stack generation (the production v3 in
kernels/fused_stack3.py and the retired v1/v2 under
wavenet_tpu/experiments/) consumes the same packed layout:
filter|gate taps concatenated on K and N so each layer's two dilated
convs become ONE [T, 2R] x [2R, 2D] matmul, with biases + the global-
conditioning contribution folded into a single additive term (constant
over time). Extracted here so retiring old kernel generations does not
orphan the live one (round-3 refactor).

Reference: the packing linearizes model.py ≈:280-360's per-layer
filter/gate convs + gc matmuls (SURVEY §3.1); parity is pinned by
tests/test_fused_stack3.py against the XLA forward.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np
from jax import lax

from wavenet_tpu.models.config import WaveNetConfig


def tap_offsets(config: WaveNetConfig) -> Tuple[int, ...]:
    """Row offset of each layer's tap window in the packed ring carry."""
    return tuple(int(o) for o in np.cumsum((0,) + config.dilations[:-1]))


def pack_stack_weights(params, config: WaveNetConfig,
                       gc_embedding: Optional[jnp.ndarray],
                       batch_size: int):
    """Model params -> (w_fg [L,2R,2D], wd [L,D,R], add [L,B,2D], bd [L,1,R])."""
    c = config
    L, R, D = c.num_layers, c.residual_channels, c.dilation_channels
    wf, wg = params["filter"], params["gate"]
    w_fg = jnp.concatenate([
        jnp.concatenate([wf[:, 0], wg[:, 0]], axis=-1),
        jnp.concatenate([wf[:, 1], wg[:, 1]], axis=-1),
    ], axis=1)
    wd = params["dense"]
    add = jnp.zeros((L, batch_size, 2 * D), jnp.float32)
    if c.use_biases:
        add = add + jnp.concatenate(
            [params["filter_bias"], params["gate_bias"]], axis=-1)[:, None, :]
        bd = params["dense_bias"][:, None, :]
    else:
        bd = jnp.zeros((L, 1, R), jnp.float32)
    if gc_embedding is not None:
        w_gc = jnp.concatenate([params["gc_filter"], params["gc_gate"]],
                               axis=-1)
        add = add + jnp.einsum("bg,lgd->lbd",
                               gc_embedding.astype(jnp.float32), w_gc,
                               precision=lax.Precision.HIGHEST)
    return w_fg, wd, add, bd

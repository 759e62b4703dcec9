"""Pallas TPU kernel: the ENTIRE dilated stack in one launch (forward).

The per-layer fused kernel (kernels/dilated_layer.py) loses to XLA on
launch overhead — 60 pallas_calls per step. This kernel runs ALL L gated
layers for a time tile inside one program: the residual activation never
leaves VMEM between layers; only each layer's gate output z_l (which the
deferred skip head and the backward pass need) is written out.

Halo handling, the crux: the stack output at time t needs input back to
t - sum(dilations). Pallas block index maps can't express overlapping
windows, so the kernel receives K = ceil(H/Tt)+1 ALIGNED views of the
input — x delayed by 0, Tt, ..., (K-1)*Tt samples — whose per-grid-step
blocks concatenate into one contiguous [W=K*Tt, R] window ending at the
current tile's end. Every layer is computed over the FULL window with
causal-zero semantics at the window head (rows whose history precedes the
window see zeros); that costs ~(K-1)/K extra FLOPs on matmuls that are
far from the MXU roofline anyway, buys fully static slice indices, and —
because the last Tt rows only reference in-window history (W - Tt >= H) —
leaves the emitted rows bit-exact.

Dtype-flexible: matmul operands in ``compute_dtype`` (f32 parity / bf16
speed), f32 accumulation, z written as ``z_dtype``.

Equality contract: outputs equal the jnp stack EXACTLY for positions
t >= sum(dilations). Earlier positions differ in a principled way: the
jnp stack zero-pads EVERY layer's input (so each layer sees zero virtual
history), while this kernel computes the virtual-history region once at
the sequence head and propagates it — with nonzero bias/gc terms those
rows diverge. The training loss only consumes positions
>= receptive_field - 1 >= sum(dilations), so it is unaffected; tests pin
the valid-suffix equality.

Scope: forward. It serves scoring/eval/teacher-forced paths directly and
is the forward half of the future fused-backward training path (round-2).
Applicability gate: filter_width == 2 and ``fits_vmem``; callers fall
back to the jnp stack otherwise.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wavenet_tpu.models.config import WaveNetConfig

_T_TILE = 2048


def stack_geometry(config: WaveNetConfig, t_tile: int = _T_TILE
                   ) -> Tuple[int, int]:
    """(K input views, window length W). Guarantees W - t_tile >= H."""
    H = sum(config.dilations)
    K = -(-H // t_tile) + 1
    return K, K * t_tile


def fits_vmem(config: WaveNetConfig, t_tile: int = _T_TILE,
              z_bytes: int = 4,
              budget_bytes: int = 13 * 1024 * 1024) -> bool:
    c = config
    K, W = stack_geometry(c, t_tile)
    L, R, D = c.num_layers, c.residual_channels, c.dilation_channels
    window = W * R * 4                      # scratch
    weights = L * (2 * R * 2 * D + D * R + 2 * D + R) * 4
    z_out = 2 * t_tile * L * D * z_bytes    # double-buffered out block
    ins = 2 * K * t_tile * R * 4
    work = 2 * W * 2 * D * 4                # fg + tap temp
    return window + weights + z_out + ins + work < budget_bytes


def pick_t_tile(config: WaveNetConfig, z_bytes: int = 4) -> Optional[int]:
    """Largest workable tile (the z output block dominates VMEM)."""
    for t in (2048, 1024, 512, 256):
        if sum(config.dilations) <= 8 * t and fits_vmem(config, t, z_bytes):
            return t
    return None


def _stack_kernel(*refs, config: WaveNetConfig, K: int, W: int,
                  t_tile: int):
    c = config
    L, R, D = c.num_layers, c.residual_channels, c.dilation_channels
    xs_refs = refs[:K]
    w_fg_ref, wd_ref, add_ref, bd_ref = refs[K:K + 4]
    y_ref, z_ref = refs[K + 4:K + 6]
    # Explicit scratch (Mosaic stack-allocates per-layer temporaries of an
    # unrolled 30-layer body without reuse — routing every intermediate
    # through fixed scratch keeps VMEM flat in L).
    cur_ref = refs[K + 6]                 # [W, R] f32
    fg_ref = refs[K + 7]                  # [W, 2D] f32
    zz_ref = refs[K + 8]                  # [W, D] f32

    b = pl.program_id(0)

    # Assemble the window. View k is x delayed by k*t_tile, so its block
    # holds original rows [j*Tt - k*Tt, ...): oldest chunk = largest k.
    for k in range(K):
        cur_ref[(K - 1 - k) * t_tile:(K - k) * t_tile, :] = xs_refs[k][0]

    cdt = w_fg_ref.dtype
    for l in range(L):
        d = c.dilations[l]
        add_row = add_ref[pl.ds(b, 1), pl.ds(l, 1), :][0]   # [1, 2D]
        fg_ref[...] = (jnp.dot(cur_ref[...].astype(cdt), w_fg_ref[l, R:, :],
                               preferred_element_type=jnp.float32)
                       + add_row)                      # current tap, [W, 2D]
        # Past tap with causal-zero head: rows [d, W) get x[t-d].
        fg_ref[d:W, :] += jnp.dot(cur_ref[:W - d, :].astype(cdt),
                                  w_fg_ref[l, :R, :],
                                  preferred_element_type=jnp.float32)
        zz_ref[...] = (jnp.tanh(fg_ref[:, :D])
                       * jax.nn.sigmoid(fg_ref[:, D:]))
        z_ref[0, :, l * D:(l + 1) * D] = (
            zz_ref[W - t_tile:, :].astype(z_ref.dtype))
        cur_ref[...] = (cur_ref[...]
                        + jnp.dot(zz_ref[...].astype(cdt), wd_ref[l],
                                  preferred_element_type=jnp.float32)
                        + bd_ref[l])

    y_ref[0] = cur_ref[W - t_tile:W, :]


def fused_stack_forward(x: jnp.ndarray, w_fg: jnp.ndarray, wd: jnp.ndarray,
                        add: jnp.ndarray, bd: jnp.ndarray,
                        config: WaveNetConfig,
                        compute_dtype=jnp.float32,
                        z_dtype=jnp.float32,
                        t_tile: int = _T_TILE):
    """Run the whole dilated stack. Returns (y [B,T,R] f32, z [B,T,L*D]).

    x: stack input (output of the causal layer) [B, T, R] f32.
    w_fg: [L, 2R, 2D] (K rows = past|current taps, N = filter|gate).
    wd: [L, D, R]; add: [L, B, 2D] (bias+gc per example); bd: [L, 1, R].
    """
    c = config
    B, T, R = x.shape
    L, D = c.num_layers, c.dilation_channels
    K, W = stack_geometry(c, t_tile)

    T_pad = -(-T // t_tile) * t_tile
    x_p = jnp.pad(x, ((0, 0), (0, T_pad - T), (0, 0)))
    n_t = T_pad // t_tile

    views = [x_p if k == 0 else
             jnp.pad(x_p, ((0, 0), (k * t_tile, 0), (0, 0)))[:, :T_pad, :]
             for k in range(K)]

    add_bl = jnp.moveaxis(add, 0, 1).astype(jnp.float32)  # [B, L, 2D]

    kernel = functools.partial(
        _stack_kernel, config=c, K=K, W=W, t_tile=t_tile)
    tile3 = lambda C: pl.BlockSpec((1, t_tile, C), lambda b, j: (b, j, 0),
                                   memory_space=pltpu.VMEM)
    y, z = pl.pallas_call(
        kernel,
        grid=(B, n_t),
        in_specs=[tile3(R)] * K + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=(tile3(R), tile3(L * D)),
        out_shape=(
            jax.ShapeDtypeStruct((B, T_pad, R), jnp.float32),
            jax.ShapeDtypeStruct((B, T_pad, L * D), z_dtype),
        ),
        scratch_shapes=[pltpu.VMEM((W, R), jnp.float32),
                        pltpu.VMEM((W, 2 * D), jnp.float32),
                        pltpu.VMEM((W, D), jnp.float32)],
    )(*views, w_fg.astype(compute_dtype), wd.astype(compute_dtype),
      add_bl, bd.astype(jnp.float32))
    return y[:, :T, :], z[:, :T, :]


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

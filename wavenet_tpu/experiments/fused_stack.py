"""Pallas TPU kernels: the ENTIRE dilated stack in one launch (fwd + bwd).

The per-layer fused kernel (now wavenet_tpu/experiments/dilated_layer.py) loses to XLA on
launch overhead — 60 pallas_calls per step. These kernels run ALL L gated
layers for a time tile inside one program; the residual activation never
leaves VMEM between layers.

The key structural idea: the TPU grid executes SEQUENTIALLY, so the
dilated taps need no halo windows at all — the kernel keeps a per-layer
"tap tail" carry in VMEM scratch (layer l owns sum-offset rows of a
[sum(dilations), R] buffer holding the last d_l rows of ITS input from
the previous time tile). That is the training-time analog of the
sampler's ring buffers: zero recompute, fully static slices, and because
a zeroed carry at t=0 is exactly causal zero-padding, outputs match the
jnp stack EXACTLY at every position.

Forward emits, per layer, the pre-activations fg_l (= conv_filter |
conv_gate + bias + gc) instead of the gate output z_l: z = tanh(fg_f) *
sigmoid(fg_g) is one cheap elementwise op outside, and saving fg makes
the BACKWARD kernel recompute-free:

  * gate derivatives come from fg directly;
  * each layer's input is reconstructed in reverse,
        current_l = current_{l+1} - z_l @ Wd_l - bd_l,
    starting from the forward's final residual output y — no activation
    checkpoints, no halo;
  * the dilated-tap gradient (da @ W0^T landing at t - d_l) and the
    tap-side weight-gradient cross tile boundaries; the backward grid
    walks time IN REVERSE and passes both through per-layer VMEM carries
    (grad rows destined for the previous tile; da rows whose paired
    input rows live in the previous tile).

Weight/bias/gc gradients accumulate into revisited output blocks over
the sequential grid. dtype: matmul operands in compute_dtype (f32
parity / bf16), f32 accumulation and carries; fg stored as fg_dtype.

Gate: filter_width == 2 and max(dilations) <= t_tile.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wavenet_tpu.kernels.mxu import mxu_dot, mxu_dot_tA, mxu_dot_tB
from wavenet_tpu.kernels.stack_pack import pack_stack_weights, tap_offsets  # noqa: F401 — shared packing, re-exported
from wavenet_tpu.models.config import WaveNetConfig

_T_TILE = 512  # max dilation <= t_tile is required; fg/dz block
               # double-buffering dominates VMEM, so tiles stay small


def supports(config: WaveNetConfig, t_tile: int = _T_TILE) -> bool:
    return (config.filter_width == 2
            and max(config.dilations) <= t_tile)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _fwd_kernel(x_ref, w_fg_ref, wd_ref, add_ref, bd_ref,
                y_ref, fg_out_ref,
                cur_ref, fgs_ref, zz_ref, tap_ref,
                *, config: WaveNetConfig, offs: Tuple[int, ...],
                t_tile: int):
    c = config
    L, R, D = c.num_layers, c.residual_channels, c.dilation_channels
    b = pl.program_id(0)
    jt = pl.program_id(1)

    @pl.when(jt == 0)
    def _():
        tap_ref[...] = jnp.zeros_like(tap_ref)

    cur_ref[...] = x_ref[0]
    cdt = w_fg_ref.dtype
    Tt = t_tile
    for l in range(L):
        d = c.dilations[l]
        o = offs[l]
        add_row = add_ref[pl.ds(b, 1), pl.ds(l, 1), :][0]   # [1, 2D]
        # Current tap + additive terms.
        fgs_ref[...] = (mxu_dot(cur_ref[...].astype(cdt), w_fg_ref[l, R:, :])
                        + add_row)
        # Past tap: first d rows come from the carry (previous tile's
        # tail of THIS layer's input), the rest from in-tile rows.
        # (d == Tt is a static special case: the whole tap is the carry.)
        if d < Tt:
            fgs_ref[0:d, :] += mxu_dot(tap_ref[o:o + d, :].astype(cdt),
                                       w_fg_ref[l, :R, :])
            fgs_ref[d:Tt, :] += mxu_dot(cur_ref[0:Tt - d, :].astype(cdt),
                                        w_fg_ref[l, :R, :])
        else:
            fgs_ref[...] += mxu_dot(tap_ref[o:o + d, :].astype(cdt),
                                    w_fg_ref[l, :R, :])
        # Refresh the carry with this tile's tail BEFORE updating cur.
        tap_ref[o:o + d, :] = cur_ref[Tt - d:Tt, :]

        fg_out_ref[0, :, 2 * D * l:2 * D * (l + 1)] = (
            fgs_ref[...].astype(fg_out_ref.dtype))
        zz_ref[...] = (jnp.tanh(fgs_ref[:, :D])
                       * jax.nn.sigmoid(fgs_ref[:, D:]))
        cur_ref[...] = (cur_ref[...]
                        + mxu_dot(zz_ref[...].astype(cdt), wd_ref[l])
                        + bd_ref[l])

    y_ref[0] = cur_ref[...]


def fused_stack_forward(x: jnp.ndarray, w_fg: jnp.ndarray, wd: jnp.ndarray,
                        add: jnp.ndarray, bd: jnp.ndarray,
                        config: WaveNetConfig,
                        compute_dtype=jnp.float32,
                        fg_dtype=jnp.float32,
                        t_tile: int = _T_TILE):
    """Whole dilated stack. Returns (y [B,T,R] f32, fg [B,T,L*2D]).

    x: stack input (causal-layer output) [B, T, R] f32.
    w_fg: [L, 2R, 2D] (rows = past|current taps, cols = filter|gate).
    wd: [L, D, R]; add: [L, B, 2D]; bd: [L, 1, R].
    fg are the gate PRE-activations; z_l = tanh(fg_f) * sigmoid(fg_g).
    """
    c = config
    B, T, R = x.shape
    L, D = c.num_layers, c.dilation_channels
    offs = tap_offsets(c)
    sum_d = sum(c.dilations)

    T_pad = -(-T // t_tile) * t_tile
    x_p = jnp.pad(x, ((0, 0), (0, T_pad - T), (0, 0)))
    n_t = T_pad // t_tile
    add_bl = jnp.moveaxis(add, 0, 1).astype(jnp.float32)

    kernel = functools.partial(_fwd_kernel, config=c, offs=offs,
                               t_tile=t_tile)
    tile3 = lambda C: pl.BlockSpec((1, t_tile, C), lambda b, j: (b, j, 0),
                                   memory_space=pltpu.VMEM)
    y, fg = pl.pallas_call(
        kernel,
        grid=(B, n_t),
        in_specs=[tile3(R)] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=(tile3(R), tile3(L * 2 * D)),
        out_shape=(
            jax.ShapeDtypeStruct((B, T_pad, R), jnp.float32),
            jax.ShapeDtypeStruct((B, T_pad, L * 2 * D), fg_dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((t_tile, R), jnp.float32),
            pltpu.VMEM((t_tile, 2 * D), jnp.float32),
            pltpu.VMEM((t_tile, D), jnp.float32),
            pltpu.VMEM((sum_d, R), jnp.float32),
        ],
    )(x_p, w_fg.astype(compute_dtype), wd.astype(compute_dtype),
      add_bl, bd.astype(jnp.float32))
    return y[:, :T, :], fg[:, :T, :]


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------

def _bwd_kernel(y_ref, fg_ref, dz_ref, dy_ref,
                w_fg_ref, wd_ref, bd_ref,
                dx_ref, dw_ref, dwd_ref, dadd_ref, dbd_ref,
                cur_ref, dcur_ref, zz_ref, da_ref, tmp_ref,
                gcarry_ref, vcarry_ref,
                *, config: WaveNetConfig, offs: Tuple[int, ...],
                t_tile: int):
    """Reverse layer sweep for one (reverse-time-order) time tile.

    gcarry: per-layer tap-gradient rows (da @ W0^T at t - d) destined for
            the PREVIOUS time tile.
    vcarry: per-layer head rows of da whose paired past-tap INPUT rows
            (cur[t - d], t < d) live in the previous tile — needed there
            for the tap-side weight gradient.
    """
    c = config
    L, R, D = c.num_layers, c.residual_channels, c.dilation_channels
    b = pl.program_id(0)
    jt = pl.program_id(1)       # 0 == LAST time tile (reverse order)
    Tt = t_tile
    cdt = w_fg_ref.dtype

    @pl.when(jt == 0)
    def _():
        gcarry_ref[...] = jnp.zeros_like(gcarry_ref)
        vcarry_ref[...] = jnp.zeros_like(vcarry_ref)

    first = jnp.logical_and(b == 0, jt == 0)

    cur_ref[...] = y_ref[0]          # current_{L} (final residual output)
    dcur_ref[...] = dy_ref[0]        # cotangent of current_{L}

    for l in reversed(range(L)):
        d = c.dilations[l]
        o = offs[l]
        fg = fg_ref[0, :, 2 * D * l:2 * D * (l + 1)].astype(jnp.float32)
        t_ = jnp.tanh(fg[:, :D])
        s_ = jax.nn.sigmoid(fg[:, D:])
        zz_ref[...] = t_ * s_

        # Grads that read dcur_{l+1} (the CURRENT content of dcur_ref).
        dwd_c = mxu_dot_tA(zz_ref[...].astype(cdt),
                           dcur_ref[...].astype(cdt))     # [D, R]
        dbd_row = jnp.sum(dcur_ref[...], axis=0, keepdims=True)  # [1, R]

        dz = dz_ref[0, :, D * l:D * (l + 1)].astype(jnp.float32)
        dz = dz + mxu_dot_tB(dcur_ref[...].astype(cdt), wd_ref[l])

        da_ref[:, 0:D] = dz * s_ * (1.0 - t_ * t_)
        da_ref[:, D:2 * D] = dz * t_ * s_ * (1.0 - s_)
        dadd_row = jnp.sum(da_ref[...], axis=0, keepdims=True)  # [1, 2D]

        # Reconstruct current_l (this layer's input).
        cur_ref[...] = (cur_ref[...]
                        - mxu_dot(zz_ref[...].astype(cdt), wd_ref[l])
                        - bd_ref[l])

        # Weight grads over THIS tile's rows.
        dw1 = mxu_dot_tA(cur_ref[...].astype(cdt), da_ref[...].astype(cdt))
        # Cross-tile: our tail rows pair with the NEXT tile's da head
        # (left in vcarry by the previous grid step).
        dw0 = mxu_dot_tA(cur_ref[Tt - d:Tt, :].astype(cdt),
                         vcarry_ref[o:o + d, :].astype(cdt))
        if d < Tt:
            dw0 = dw0 + mxu_dot_tA(cur_ref[0:Tt - d, :].astype(cdt),
                                   da_ref[d:Tt, :].astype(cdt))

        # dcur_l = dcur_{l+1} (residual) + both tap backprops.
        tmp_ref[...] = mxu_dot_tB(da_ref[...].astype(cdt), w_fg_ref[l, R:, :])
        dcur_ref[...] += tmp_ref[...]
        tmp_ref[...] = mxu_dot_tB(da_ref[...].astype(cdt), w_fg_ref[l, :R, :])
        if d < Tt:
            dcur_ref[0:Tt - d, :] += tmp_ref[d:Tt, :]
        # Consume the later tile's tap-grad carry into our tail, then
        # leave our head rows for the earlier tile.
        dcur_ref[Tt - d:Tt, :] += gcarry_ref[o:o + d, :]
        gcarry_ref[o:o + d, :] = tmp_ref[0:d, :]
        vcarry_ref[o:o + d, :] = da_ref[0:d, :]

        @pl.when(first)
        def _():
            dw_ref[l, 0] = dw0
            dw_ref[l, 1] = dw1
            dwd_ref[l] = dwd_c
            dbd_ref[pl.ds(l, 1), 0, :] = dbd_row
        @pl.when(jnp.logical_not(first))
        def _():
            dw_ref[l, 0] += dw0
            dw_ref[l, 1] += dw1
            dwd_ref[l] += dwd_c
            dbd_ref[pl.ds(l, 1), 0, :] += dbd_row

        @pl.when(jt == 0)
        def _():
            dadd_ref[pl.ds(b, 1), pl.ds(l, 1), :] = dadd_row[None]
        @pl.when(jt > 0)
        def _():
            dadd_ref[pl.ds(b, 1), pl.ds(l, 1), :] += dadd_row[None]

    dx_ref[0] = dcur_ref[...]


def fused_stack_backward(y, fg, dz, dy, w_fg, wd, bd,
                         config: WaveNetConfig,
                         compute_dtype=jnp.float32,
                         t_tile: int = _T_TILE):
    """VJP of the stack from saved (y, fg). Returns
    (dx, dw_fg [L,2,R,2D], dwd, dadd [L,B,2D], dbd [L,1,R])."""
    c = config
    B, T, R = y.shape
    L, D = c.num_layers, c.dilation_channels
    offs = tap_offsets(c)
    sum_d = sum(c.dilations)

    T_pad = -(-T // t_tile) * t_tile
    pad3 = lambda a: jnp.pad(a, ((0, 0), (0, T_pad - T), (0, 0)))
    if compute_dtype == jnp.bfloat16:
        dz = dz.astype(jnp.bfloat16)   # halves the dominant input block
    y_p, fg_p, dz_p, dy_p = pad3(y), pad3(fg), pad3(dz), pad3(dy)
    n_t = T_pad // t_tile

    kernel = functools.partial(_bwd_kernel, config=c, offs=offs,
                               t_tile=t_tile)
    # Time axis REVERSED: grid step j processes time tile n_t-1-j.
    rtile = lambda C: pl.BlockSpec((1, t_tile, C),
                                   lambda b, j: (b, n_t - 1 - j, 0),
                                   memory_space=pltpu.VMEM)
    dx, dw, dwd, dadd, dbd = pl.pallas_call(
        kernel,
        grid=(B, n_t),
        in_specs=[rtile(R), rtile(L * 2 * D), rtile(L * D), rtile(R)]
                 + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=(
            rtile(R),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, T_pad, R), jnp.float32),
            jax.ShapeDtypeStruct((L, 2, R, 2 * D), jnp.float32),
            jax.ShapeDtypeStruct((L, D, R), jnp.float32),
            jax.ShapeDtypeStruct((B, L, 2 * D), jnp.float32),
            jax.ShapeDtypeStruct((L, 1, R), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((t_tile, R), jnp.float32),      # cur
            pltpu.VMEM((t_tile, R), jnp.float32),      # dcur
            pltpu.VMEM((t_tile, D), jnp.float32),      # z
            pltpu.VMEM((t_tile, 2 * D), jnp.float32),  # da
            pltpu.VMEM((t_tile, R), jnp.float32),      # tmp (da @ W^T)
            pltpu.VMEM((sum_d, R), jnp.float32),       # gcarry
            pltpu.VMEM((sum_d, 2 * D), jnp.float32),   # vcarry
        ],
    )(y_p, fg_p, dz_p, dy_p,
      w_fg.astype(compute_dtype), wd.astype(compute_dtype),
      bd.astype(jnp.float32))
    # dadd comes out [B, L, 2D] -> caller layout [L, B, 2D].
    return (dx[:, :T, :], dw, dwd, jnp.moveaxis(dadd, 0, 1), dbd)


# ---------------------------------------------------------------------------
# custom-VJP wrapper: (x, weights) -> (y, z)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_stack(x, w_fg, wd, add, bd, config: WaveNetConfig,
                compute_dtype=jnp.float32, t_tile: int = _T_TILE):
    """Differentiable whole-stack op. Returns (y [B,T,R], z [B,T,L*D])."""
    fg_dtype = (jnp.bfloat16 if compute_dtype == jnp.bfloat16
                else jnp.float32)
    y, fg = fused_stack_forward(x, w_fg, wd, add, bd, config,
                                compute_dtype, fg_dtype, t_tile)
    z = _fg_to_z(fg, config)
    return y, z


def _fg_to_z(fg, config):
    D = config.dilation_channels
    L = config.num_layers
    f = fg.reshape(fg.shape[0], fg.shape[1], L, 2 * D).astype(jnp.float32)
    return (jnp.tanh(f[..., :D])
            * jax.nn.sigmoid(f[..., D:])).reshape(
                fg.shape[0], fg.shape[1], L * D)


def _fs_fwd_full(x, w_fg, wd, add, bd, config, compute_dtype, t_tile):
    fg_dtype = (jnp.bfloat16 if compute_dtype == jnp.bfloat16
                else jnp.float32)
    y, fg = fused_stack_forward(x, w_fg, wd, add, bd, config,
                                compute_dtype, fg_dtype, t_tile)
    z = _fg_to_z(fg, config)
    return (y, z), (y, fg, w_fg, wd, bd)


def _fs_bwd_full(config, compute_dtype, t_tile, res, grads):
    y, fg, w_fg, wd, bd = res
    dy, dz = grads
    dx, dw, dwd, dadd, dbd = fused_stack_backward(
        y, fg, dz, dy, w_fg, wd, bd, config, compute_dtype, t_tile)
    # dw [L, 2, R, 2D] matches the packed w_fg layout [L, 2R, 2D]:
    dw_packed = jnp.concatenate([dw[:, 0], dw[:, 1]], axis=1)
    return dx, dw_packed, dwd, dadd, dbd


fused_stack.defvjp(_fs_fwd_full, _fs_bwd_full)

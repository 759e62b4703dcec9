"""Streamed-DMA fused dilated stack (v2): big time tiles, K=64 matmuls.

Round-1's whole-stack kernel (now wavenet_tpu/experiments/fused_stack.py) was correct but
LOST to XLA (157 vs 399 audio-s/s): its fg/dz tensors were grid-blocked
inputs/outputs, whose double-buffered [Tt, L*2D] blocks dominate VMEM and
cap the time tile at Tt=512 — leaving ~300 grid programs of ~180 tiny
dependent matmuls (docs/performance.md:46-55 has the full post-mortem).

v2 keeps v1's proven carry machinery (per-layer dilated-tap tails ride a
[sum(dilations), R] VMEM carry between sequential grid steps; backward
reconstructs each layer's input in reverse and passes cross-tile tap
gradients through two more carries) and changes three things:

1. **The forward's per-layer activations leave VMEM through manual DMA,
   not grid blocks.** Each layer writes one 128-lane RECORD per time
   step — lanes [0:2D) = gate pre-activations fg, [2D:3D) = gate output
   z, rest zero — into a double-buffered [Tt, 128] slot that streams to
   an HBM tensor of shape [B, T, L*128] while the next layer computes.
   128 lanes because Mosaic requires DMA slices of tiled (VMEM) memrefs
   to be lane-tile aligned — a [Tt, 2D] slice is not DMA-able. The
   backward prefetches the same records per layer. Only [Tt, R]-class
   buffers stay grid-blocked, so the time tile grows 4-8x and each
   matmul's M dimension with it.

2. **One K=2R matmul per gated unit.** The past and current taps are
   packed side by side in a [Tt, 2R] scratch (the past half is the carry
   head + a shifted copy of the resident input), so the MXU sees
   [Tt, 2R] x [2R, 2D] — double the K utilization of v1's two K=R
   matmuls, half the issue count. The backward uses the same packing for
   the tap weight-gradient and tap-backprop matmuls.

3. **z comes straight out of the forward kernel** (in the record), so
   the XLA side never runs a separate fg -> z pass over the largest
   tensor in the network.

dz (cotangent of z, produced by the XLA skip-head backward) stays a
grid-BLOCKED input of the backward kernel: at L*D lanes it fits 2-4x
bigger tiles than v1's fg+dz pair did, and giving it record layout would
make XLA scatter 4x the bytes.

Numerics are IDENTICAL to v1 and to the jnp stack at every position
(f32 accumulation everywhere; a zeroed carry is exactly causal padding),
which the gradient-parity tests assert.

Reference behavior being accelerated: the dilated-conv stack of
wavenet/model.py ≈:280-360 (_create_dilation_layer) /
ops.py ≈:50 (causal_conv).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wavenet_tpu.kernels.mxu import mxu_dot, mxu_dot_tA, mxu_dot_tB
from wavenet_tpu.models.config import WaveNetConfig
from wavenet_tpu.kernels.stack_pack import pack_stack_weights, tap_offsets

_T_TILE_FWD = 2048
_T_TILE_BWD = 1024
_REC = 128      # lanes per layer record (DMA lane-tile alignment)
# Mosaic's default VMEM budget (~16 MB) rejects the larger time tiles;
# v5e has 128 MB of physical VMEM per core — let tiles up to ~8k rows
# compile and let the scheduler arbitrate.
_VMEM_LIMIT = 100 * 1024 * 1024


def supports(config: WaveNetConfig, t_tile: int = _T_TILE_BWD) -> bool:
    return (config.filter_width == 2
            and max(config.dilations) <= t_tile
            and 3 * config.dilation_channels <= _REC)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _fwd_kernel(x_ref, w_fg_ref, wd_ref, add_ref, bd_ref,
                y_ref, fgz_hbm,
                cur_ref, cat_ref, fgs_ref, recbuf_ref, tap_ref, sem,
                *, config: WaveNetConfig, offs: Tuple[int, ...],
                t_tile: int):
    c = config
    L, R, D = c.num_layers, c.residual_channels, c.dilation_channels
    b = pl.program_id(0)
    jt = pl.program_id(1)
    Tt = t_tile
    cdt = w_fg_ref.dtype
    t0 = jt * Tt

    @pl.when(jt == 0)
    def _():
        tap_ref[...] = jnp.zeros_like(tap_ref)

    def rec_dma(l):
        return pltpu.make_async_copy(
            recbuf_ref.at[l % 2],
            fgz_hbm.at[b, pl.ds(t0, Tt), pl.ds(_REC * l, _REC)],
            sem.at[l % 2])

    cur_ref[...] = x_ref[0]
    for l in range(L):
        d = c.dilations[l]
        o = offs[l]
        slot = l % 2
        if l >= 2:
            # The slot's previous DMA must land before we overwrite it.
            rec_dma(l - 2).wait()
        else:
            # First use of each slot this program: zero the pad lanes so
            # the record's tail never carries garbage into HBM.
            recbuf_ref[slot, :, 3 * D:] = jnp.zeros(
                (Tt, _REC - 3 * D), recbuf_ref.dtype)

        # Pack [past | current] taps side by side: one K=2R matmul.
        cat_ref[:, R:] = cur_ref[...].astype(cdt)
        cat_ref[0:d, 0:R] = tap_ref[o:o + d, :].astype(cdt)
        if d < Tt:
            cat_ref[d:Tt, 0:R] = cur_ref[0:Tt - d, :].astype(cdt)
        # Refresh the carry with this tile's tail BEFORE the residual add.
        tap_ref[o:o + d, :] = cur_ref[Tt - d:Tt, :]

        add_row = add_ref[pl.ds(l, 1), pl.ds(b, 1), :][0]     # [1, 2D]
        fgs_ref[...] = (mxu_dot(cat_ref[...], w_fg_ref[l])
                        + add_row)
        zz = jnp.tanh(fgs_ref[:, :D]) * jax.nn.sigmoid(fgs_ref[:, D:])
        recbuf_ref[slot, :, 0:2 * D] = fgs_ref[...].astype(recbuf_ref.dtype)
        recbuf_ref[slot, :, 2 * D:3 * D] = zz.astype(recbuf_ref.dtype)
        rec_dma(l).start()

        cur_ref[...] = (cur_ref[...]
                        + mxu_dot(zz.astype(cdt), wd_ref[l])
                        + bd_ref[l])

    y_ref[0] = cur_ref[...]
    for l in range(max(0, L - 2), L):
        rec_dma(l).wait()


def fused_stack2_forward(x, w_fg, wd, add, bd, config: WaveNetConfig,
                         compute_dtype=jnp.float32, fg_dtype=jnp.float32,
                         t_tile: int = _T_TILE_FWD, interpret: bool = False):
    """Whole dilated stack. Returns (y [B,T,R] f32, fgz [B,T,L*128]).

    fgz is the per-layer record stream: for layer l, lanes
    [128l, 128l+2D) are the gate pre-activations, [128l+2D, 128l+3D) the
    gate outputs z, the rest zeros.
    """
    c = config
    B, T, R = x.shape
    L, D = c.num_layers, c.dilation_channels
    offs = tap_offsets(c)
    sum_d = sum(c.dilations)

    T_pad = -(-T // t_tile) * t_tile
    x_p = jnp.pad(x, ((0, 0), (0, T_pad - T), (0, 0)))
    n_t = T_pad // t_tile
    add_f = add.astype(jnp.float32)

    kernel = functools.partial(_fwd_kernel, config=c, offs=offs,
                               t_tile=t_tile)
    tile_r = pl.BlockSpec((1, t_tile, R), lambda b, j: (b, j, 0),
                          memory_space=pltpu.VMEM)
    y, fgz = pl.pallas_call(
        kernel,
        grid=(B, n_t),
        in_specs=[tile_r] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=(tile_r, pl.BlockSpec(memory_space=pl.ANY)),
        out_shape=(
            jax.ShapeDtypeStruct((B, T_pad, R), jnp.float32),
            jax.ShapeDtypeStruct((B, T_pad, L * _REC), fg_dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((t_tile, R), jnp.float32),          # cur
            pltpu.VMEM((t_tile, 2 * R), compute_dtype),    # cat
            pltpu.VMEM((t_tile, 2 * D), jnp.float32),      # fgs
            pltpu.VMEM((2, t_tile, _REC), fg_dtype),       # record slots
            pltpu.VMEM((sum_d, R), jnp.float32),           # tap carry
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(x_p, w_fg.astype(compute_dtype), wd.astype(compute_dtype),
      add_f, bd.astype(jnp.float32))
    return y[:, :T, :], fgz[:, :T, :]


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------

def _bwd_kernel(y_ref, dy_ref, dz_ref, w_fg_ref, wd_ref, bd_ref,
                fgz_hbm,
                dx_ref, dw_ref, dwd_ref, dadd_ref, dbd_ref,
                cur_ref, dcur_ref, cat_ref, zz_ref, da_ref, tmp_ref,
                recbuf_ref, gcarry_ref, vcarry_ref, sem,
                *, config: WaveNetConfig, offs: Tuple[int, ...],
                t_tile: int, n_t: int):
    """Reverse layer sweep over one (reverse-order) time tile.

    gcarry: per-layer tap-gradient rows (da @ W0^T at t - d) destined for
            the PREVIOUS (earlier-time) tile.
    vcarry: per-layer head rows of da whose paired past-tap INPUT rows
            live in the previous tile — consumed there for the tap-side
            weight gradient.
    """
    c = config
    L, R, D = c.num_layers, c.residual_channels, c.dilation_channels
    b = pl.program_id(0)
    jt = pl.program_id(1)          # 0 == LAST time tile (reverse order)
    Tt = t_tile
    cdt = w_fg_ref.dtype
    t0 = (n_t - 1 - jt) * Tt

    def rec_dma(l):
        return pltpu.make_async_copy(
            fgz_hbm.at[b, pl.ds(t0, Tt), pl.ds(_REC * l, _REC)],
            recbuf_ref.at[l % 2],
            sem.at[l % 2])

    @pl.when(jt == 0)
    def _():
        gcarry_ref[...] = jnp.zeros_like(gcarry_ref)
        vcarry_ref[...] = jnp.zeros_like(vcarry_ref)

    first = jnp.logical_and(b == 0, jt == 0)

    # Prefetch the top two layers' records.
    rec_dma(L - 1).start()
    if L >= 2:
        rec_dma(L - 2).start()

    cur_ref[...] = y_ref[0]        # current_{L} (final residual output)
    dcur_ref[...] = dy_ref[0]      # cotangent of current_{L}

    for l in reversed(range(L)):
        d = c.dilations[l]
        o = offs[l]
        rec_dma(l).wait()
        fg = recbuf_ref[l % 2, :, 0:2 * D].astype(jnp.float32)
        if l >= 2:
            rec_dma(l - 2).start()

        t_ = jnp.tanh(fg[:, :D])
        s_ = jax.nn.sigmoid(fg[:, D:])
        zz_ref[...] = t_ * s_

        # Grads that read dcur_{l+1} (current content of dcur_ref).
        dwd_c = mxu_dot_tA(zz_ref[...].astype(cdt),
                           dcur_ref[...].astype(cdt))      # [D, R]
        dbd_row = jnp.sum(dcur_ref[...], axis=0, keepdims=True)  # [1, R]

        dz = dz_ref[0, :, D * l:D * (l + 1)].astype(jnp.float32)
        dz = dz + mxu_dot_tB(dcur_ref[...].astype(cdt), wd_ref[l])

        da_ref[:, 0:D] = dz * s_ * (1.0 - t_ * t_)
        da_ref[:, D:2 * D] = dz * t_ * s_ * (1.0 - s_)
        dadd_row = jnp.sum(da_ref[...], axis=0, keepdims=True)   # [1, 2D]

        # Reconstruct current_l (this layer's input).
        cur_ref[...] = (cur_ref[...]
                        - mxu_dot(zz_ref[...].astype(cdt), wd_ref[l])
                        - bd_ref[l])

        # Packed weight grad: [past | current] columns in one matmul.
        cat_ref[:, R:] = cur_ref[...].astype(cdt)
        cat_ref[0:d, 0:R] = jnp.zeros((d, R), cat_ref.dtype)
        if d < Tt:
            cat_ref[d:Tt, 0:R] = cur_ref[0:Tt - d, :].astype(cdt)
        dw_cat = mxu_dot_tA(cat_ref[...], da_ref[...].astype(cdt))  # [2R, 2D]
        # Cross-tile past-tap rows: our tail inputs pair with the LATER
        # tile's da head (left in vcarry by the previous grid step).
        dw0_x = mxu_dot_tA(cur_ref[Tt - d:Tt, :].astype(cdt),
                           vcarry_ref[o:o + d, :].astype(cdt))      # [R, 2D]

        # dcur_l = residual passthrough + both tap backprops.
        tmp_ref[...] = mxu_dot_tB(da_ref[...].astype(cdt),
                                  w_fg_ref[l])          # [Tt, 2R]
        dcur_ref[...] += tmp_ref[:, R:]
        if d < Tt:
            dcur_ref[0:Tt - d, :] += tmp_ref[d:Tt, 0:R]
        # Consume the later tile's tap-grad carry into our tail, then
        # leave our head rows for the earlier tile.
        dcur_ref[Tt - d:Tt, :] += gcarry_ref[o:o + d, :]
        gcarry_ref[o:o + d, :] = tmp_ref[0:d, 0:R]
        vcarry_ref[o:o + d, :] = da_ref[0:d, :]

        @pl.when(first)
        def _():
            dw_ref[l, 0] = dw_cat[0:R] + dw0_x
            dw_ref[l, 1] = dw_cat[R:]
            dwd_ref[l] = dwd_c
            dbd_ref[pl.ds(l, 1), 0, :] = dbd_row
        @pl.when(jnp.logical_not(first))
        def _():
            dw_ref[l, 0] += dw_cat[0:R] + dw0_x
            dw_ref[l, 1] += dw_cat[R:]
            dwd_ref[l] += dwd_c
            dbd_ref[pl.ds(l, 1), 0, :] += dbd_row

        @pl.when(jt == 0)
        def _():
            dadd_ref[pl.ds(b, 1), pl.ds(l, 1), :] = dadd_row[None]
        @pl.when(jt > 0)
        def _():
            dadd_ref[pl.ds(b, 1), pl.ds(l, 1), :] += dadd_row[None]

    dx_ref[0] = dcur_ref[...]


def fused_stack2_backward(y, dy, fgz, dz, w_fg, wd, bd,
                          config: WaveNetConfig,
                          compute_dtype=jnp.float32,
                          t_tile: int = _T_TILE_BWD,
                          interpret: bool = False):
    """VJP of the stack from saved (y, fgz). Returns
    (dx, dw_fg [L,2,R,2D], dwd, dadd [L,B,2D], dbd [L,1,R])."""
    c = config
    B, T, R = y.shape
    L, D = c.num_layers, c.dilation_channels
    offs = tap_offsets(c)
    sum_d = sum(c.dilations)
    fg_dtype = fgz.dtype

    T_pad = -(-T // t_tile) * t_tile
    pad3 = lambda a: jnp.pad(a, ((0, 0), (0, T_pad - T), (0, 0)))
    y_p, dy_p, fgz_p = pad3(y), pad3(dy), pad3(fgz)
    dz_p = pad3(dz.astype(fg_dtype))
    n_t = T_pad // t_tile

    kernel = functools.partial(_bwd_kernel, config=c, offs=offs,
                               t_tile=t_tile, n_t=n_t)
    rtile = lambda C: pl.BlockSpec(
        (1, t_tile, C), lambda b, j: (b, n_t - 1 - j, 0),
        memory_space=pltpu.VMEM)
    vmem_whole = pl.BlockSpec(memory_space=pltpu.VMEM)
    dx, dw, dwd, dadd, dbd = pl.pallas_call(
        kernel,
        grid=(B, n_t),
        in_specs=[rtile(R), rtile(R), rtile(L * D),
                  vmem_whole, vmem_whole, vmem_whole,
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(rtile(R), vmem_whole, vmem_whole, vmem_whole,
                   vmem_whole),
        out_shape=(
            jax.ShapeDtypeStruct((B, T_pad, R), jnp.float32),
            jax.ShapeDtypeStruct((L, 2, R, 2 * D), jnp.float32),
            jax.ShapeDtypeStruct((L, D, R), jnp.float32),
            jax.ShapeDtypeStruct((B, L, 2 * D), jnp.float32),
            jax.ShapeDtypeStruct((L, 1, R), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((t_tile, R), jnp.float32),          # cur
            pltpu.VMEM((t_tile, R), jnp.float32),          # dcur
            pltpu.VMEM((t_tile, 2 * R), compute_dtype),    # cat
            pltpu.VMEM((t_tile, D), jnp.float32),          # zz
            pltpu.VMEM((t_tile, 2 * D), jnp.float32),      # da
            pltpu.VMEM((t_tile, 2 * R), jnp.float32),      # tmp (da @ W^T)
            pltpu.VMEM((2, t_tile, _REC), fg_dtype),       # record slots
            pltpu.VMEM((sum_d, R), jnp.float32),           # gcarry
            pltpu.VMEM((sum_d, 2 * D), jnp.float32),       # vcarry
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(y_p, dy_p, dz_p, w_fg.astype(compute_dtype), wd.astype(compute_dtype),
      bd.astype(jnp.float32), fgz_p)
    # dadd comes out [B, L, 2D] -> caller layout [L, B, 2D].
    return (dx[:, :T, :], dw, dwd, jnp.moveaxis(dadd, 0, 1), dbd)


# ---------------------------------------------------------------------------
# custom-VJP wrapper: (x, weights) -> (y, z)
# ---------------------------------------------------------------------------

def _extract_z(fgz, config):
    B, T = fgz.shape[:2]
    L, D = config.num_layers, config.dilation_channels
    rec = fgz.reshape(B, T, L, _REC)
    return rec[..., 2 * D:3 * D].reshape(B, T, L * D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def fused_stack2(x, w_fg, wd, add, bd, config: WaveNetConfig,
                 compute_dtype=jnp.float32,
                 t_tile_fwd: int = _T_TILE_FWD,
                 t_tile_bwd: int = _T_TILE_BWD,
                 interpret: bool = False):
    """Differentiable whole-stack op. Returns (y [B,T,R], z [B,T,L*D]).

    Unlike v1, z comes straight out of the forward kernel's DMA stream —
    no separate fg -> z pass over the largest tensor in the network.
    """
    fg_dtype = (jnp.bfloat16 if compute_dtype == jnp.bfloat16
                else jnp.float32)
    y, fgz = fused_stack2_forward(x, w_fg, wd, add, bd, config,
                                  compute_dtype, fg_dtype,
                                  t_tile_fwd, interpret)
    return y, _extract_z(fgz, config)


def _fs2_fwd(x, w_fg, wd, add, bd, config, compute_dtype,
             t_tile_fwd, t_tile_bwd, interpret):
    fg_dtype = (jnp.bfloat16 if compute_dtype == jnp.bfloat16
                else jnp.float32)
    y, fgz = fused_stack2_forward(x, w_fg, wd, add, bd, config,
                                  compute_dtype, fg_dtype,
                                  t_tile_fwd, interpret)
    return (y, _extract_z(fgz, config)), (y, fgz, w_fg, wd, bd)


def _fs2_bwd(config, compute_dtype, t_tile_fwd, t_tile_bwd, interpret,
             res, grads):
    y, fgz, w_fg, wd, bd = res
    dy, dz = grads
    dx, dw, dwd, dadd, dbd = fused_stack2_backward(
        y, dy, fgz, dz, w_fg, wd, bd, config, compute_dtype, t_tile_bwd,
        interpret)
    # dw [L, 2, R, 2D] -> packed w_fg layout [L, 2R, 2D].
    dw_packed = jnp.concatenate([dw[:, 0], dw[:, 1]], axis=1)
    return dx, dw_packed, dwd, dadd, dbd


fused_stack2.defvjp(_fs2_fwd, _fs2_bwd)

__all__ = ["fused_stack2", "fused_stack2_forward", "fused_stack2_backward",
           "pack_stack_weights", "supports"]

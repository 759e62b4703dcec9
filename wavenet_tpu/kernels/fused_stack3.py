"""Batch-folded streamed fused dilated stack (v3): M = B*Tt matmuls.

v2 (kernels/fused_stack2.py) streams activations through manual DMA and
packs the two taps into one K=2R matmul, but keeps batch in the GRID —
each program's matmuls see M = Tt rows only, and B*n_t programs repeat
every per-op fixed cost (issue latency, fences, carry bookkeeping) B
times. Measured on v5-lite: fwd 9.7 ms / fwd+bwd 33 ms vs the XLA
stack's ~20 ms full step (tools/r2_stack_experiments.py, round 2).

v3 folds batch into the matmul M dimension:

* **Grid = time tiles only.** Every row buffer holds all B sequences
  b-major ([B*Tt, C]); the MXU sees [B*Tt, 2R] x [2R, 2D] — 8x the M
  of v2 at batch 8, with 8x fewer grid programs. Batch-dependent
  row shifts (the dilated-tap pack, carry updates, halo adds) become
  B small static-sliced copies per layer — VPU work that overlaps the
  matmuls' MXU occupancy.

* **Records carry fg only** ([B, T, L, 2D], bf16 in bf16 mode). The
  backward recomputes z = tanh(f)*sigmoid(g) from fg (it needs tanh/
  sigmoid anyway for the gate gradient), so z is not stored twice.

* **z leaves the kernel in head-ready layout** [B, T, L, D] — a free
  XLA reshape away from the [B*T, L*D] deferred-skip matmul. v2's
  128-lane records forced an XLA slice pass over the biggest tensor in
  the network (read 1.3 GB, write 0.3 GB per step) just to extract z;
  v3 eliminates it, and the backward receives dz through the same
  layout (per-(b,l) DMA slices, no lane-tile constraint because the
  VMEM side is always a full-width buffer).

* Carries are lane-packed [sum_d, B*R] (batch in lanes) instead of
  [sum_d, R] per program — no 32->128 lane-padding blowup.

Numerics are identical to v1/v2 and the jnp stack (f32 accumulation,
zeroed carry == causal padding; exact-f32 MXU passes via mxu_dot).

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
from wavenet_tpu.kernels.fused_stack import pack_stack_weights, tap_offsets

_T_TILE_FWD = 2048
_T_TILE_BWD = 1024
_VMEM_LIMIT = 100 * 1024 * 1024


def supports(config: WaveNetConfig, t_tile: int = _T_TILE_BWD) -> bool:
    return (config.filter_width == 2
            and max(config.dilations) <= t_tile)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _fwd_kernel(x_ref, w_fg_ref, wd_ref, add_ref, bd_ref,
                y_ref, fg_hbm, z_hbm,
                cur_ref, cat_ref, fgs_ref, fgbuf_ref, zbuf_ref, tap_ref,
                fsem, zsem,
                *, config: WaveNetConfig, offs: Tuple[int, ...],
                t_tile: int, batch: int, uniform_add: bool):
    c = config
    L, R, D = c.num_layers, c.residual_channels, c.dilation_channels
    B = batch
    jt = pl.program_id(0)
    Tt = t_tile
    cdt = w_fg_ref.dtype
    t0 = jt * Tt

    @pl.when(jt == 0)
    def _():
        tap_ref[...] = jnp.zeros_like(tap_ref)

    def fg_dma(l, b):
        return pltpu.make_async_copy(
            fgbuf_ref.at[l % 2, pl.ds(b * Tt, Tt), :],
            fg_hbm.at[b, pl.ds(t0, Tt), l, :],
            fsem.at[l % 2, b])

    def z_dma(l, b):
        return pltpu.make_async_copy(
            zbuf_ref.at[l % 2, pl.ds(b * Tt, Tt), :],
            z_hbm.at[b, pl.ds(t0, Tt), l, :],
            zsem.at[l % 2, b])

    for b in range(B):
        cur_ref[b * Tt:(b + 1) * Tt, :] = x_ref[b]

    for l in range(L):
        d = c.dilations[l]
        o = offs[l]
        slot = l % 2
        if l >= 2:
            # The slot's previous DMAs must land before we overwrite it.
            for b in range(B):
                fg_dma(l - 2, b).wait()
                z_dma(l - 2, b).wait()

        # Pack [past | current] taps side by side: one K=2R matmul.
        cat_ref[:, R:] = cur_ref[...].astype(cdt)
        for b in range(B):
            r0 = b * Tt
            cat_ref[r0:r0 + d, 0:R] = (
                tap_ref[o:o + d, b * R:(b + 1) * R].astype(cdt))
            if d < Tt:
                cat_ref[r0 + d:r0 + Tt, 0:R] = (
                    cur_ref[r0:r0 + Tt - d, :].astype(cdt))
            # Refresh the carry with this tile's tail BEFORE the
            # residual add.
            tap_ref[o:o + d, b * R:(b + 1) * R] = (
                cur_ref[r0 + Tt - d:r0 + Tt, :])

        fgs_ref[...] = mxu_dot(cat_ref[...], w_fg_ref[l])
        if uniform_add:
            fgs_ref[...] += add_ref[pl.ds(l, 1), pl.ds(0, 1), :][0]
        else:
            for b in range(B):
                fgs_ref[b * Tt:(b + 1) * Tt, :] += (
                    add_ref[pl.ds(l, 1), pl.ds(b, 1), :][0])
        zz = jnp.tanh(fgs_ref[:, :D]) * jax.nn.sigmoid(fgs_ref[:, D:])
        fgbuf_ref[slot] = fgs_ref[...].astype(fgbuf_ref.dtype)
        zbuf_ref[slot] = zz.astype(zbuf_ref.dtype)
        for b in range(B):
            fg_dma(l, b).start()
            z_dma(l, b).start()

        cur_ref[...] = (cur_ref[...]
                        + mxu_dot(zz.astype(cdt), wd_ref[l])
                        + bd_ref[l])

    for b in range(B):
        y_ref[b] = cur_ref[b * Tt:(b + 1) * Tt, :]
    for l in range(max(0, L - 2), L):
        for b in range(B):
            fg_dma(l, b).wait()
            z_dma(l, b).wait()


def fused_stack3_forward(x, w_fg, wd, add, bd, config: WaveNetConfig,
                         compute_dtype=jnp.float32, fg_dtype=jnp.float32,
                         t_tile: int = _T_TILE_FWD, uniform_add: bool = False,
                         interpret: bool = False):
    """Whole dilated stack, batch-folded. Returns
    (y [B,T,R] f32, fg [B,T,L,2D] fg_dtype, z [B,T,L,D] fg_dtype)."""
    c = config
    B, T, R = x.shape
    L, D = c.num_layers, c.dilation_channels
    offs = tap_offsets(c)
    sum_d = sum(c.dilations)

    T_pad = -(-T // t_tile) * t_tile
    x_p = jnp.pad(x, ((0, 0), (0, T_pad - T), (0, 0)))
    n_t = T_pad // t_tile
    M = B * t_tile

    kernel = functools.partial(_fwd_kernel, config=c, offs=offs,
                               t_tile=t_tile, batch=B,
                               uniform_add=uniform_add)
    tile_r = pl.BlockSpec((B, t_tile, R), lambda j: (0, j, 0),
                          memory_space=pltpu.VMEM)
    y, fg, z = pl.pallas_call(
        kernel,
        grid=(n_t,),
        in_specs=[tile_r] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=(tile_r, pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)),
        out_shape=(
            jax.ShapeDtypeStruct((B, T_pad, R), jnp.float32),
            jax.ShapeDtypeStruct((B, T_pad, L, 2 * D), fg_dtype),
            jax.ShapeDtypeStruct((B, T_pad, L, D), fg_dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((M, R), jnp.float32),               # cur
            pltpu.VMEM((M, 2 * R), compute_dtype),         # cat
            pltpu.VMEM((M, 2 * D), jnp.float32),           # fgs
            pltpu.VMEM((2, M, 2 * D), fg_dtype),           # fg slots
            pltpu.VMEM((2, M, D), fg_dtype),               # z slots
            pltpu.VMEM((sum_d, B * R), jnp.float32),       # tap carry
            pltpu.SemaphoreType.DMA((2, B)),
            pltpu.SemaphoreType.DMA((2, B)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(x_p, w_fg.astype(compute_dtype), wd.astype(compute_dtype),
      add.astype(jnp.float32), bd.astype(jnp.float32))
    return y[:, :T, :], fg[:, :T], z[:, :T]


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------

def _bwd_kernel(y_ref, dy_ref, w_fg_ref, wd_ref, bd_ref,
                fg_hbm, dz_hbm,
                dx_ref, dw_ref, dwd_ref, dadd_ref, dbd_ref,
                cur_ref, dcur_ref, cat_ref, da_ref, tmp_ref,
                fgbuf_ref, dzbuf_ref, gcarry_ref, vcarry_ref,
                fsem, dzsem,
                *, config: WaveNetConfig, offs: Tuple[int, ...],
                t_tile: int, n_t: int, batch: int):
    """Reverse layer sweep over one (reverse-order) time tile.

    gcarry: per-layer tap-gradient rows destined for the PREVIOUS
            (earlier-time) tile, lanes packed per batch.
    vcarry: per-layer head rows of da whose paired past-tap INPUT rows
            live in the previous tile.
    """
    c = config
    L, R, D = c.num_layers, c.residual_channels, c.dilation_channels
    B = batch
    jt = pl.program_id(0)          # 0 == LAST time tile (reverse order)
    Tt = t_tile
    cdt = w_fg_ref.dtype
    t0 = (n_t - 1 - jt) * Tt

    def fg_dma(l, b):
        return pltpu.make_async_copy(
            fg_hbm.at[b, pl.ds(t0, Tt), l, :],
            fgbuf_ref.at[l % 2, pl.ds(b * Tt, Tt), :],
            fsem.at[l % 2, b])

    def dz_dma(l, b):
        return pltpu.make_async_copy(
            dz_hbm.at[b, pl.ds(t0, Tt), l, :],
            dzbuf_ref.at[l % 2, pl.ds(b * Tt, Tt), :],
            dzsem.at[l % 2, b])

    @pl.when(jt == 0)
    def _():
        gcarry_ref[...] = jnp.zeros_like(gcarry_ref)
        vcarry_ref[...] = jnp.zeros_like(vcarry_ref)

    first = jt == 0

    # Prefetch the top two layers' records.
    for b in range(B):
        fg_dma(L - 1, b).start()
        dz_dma(L - 1, b).start()
        if L >= 2:
            fg_dma(L - 2, b).start()
            dz_dma(L - 2, b).start()

    for b in range(B):
        cur_ref[b * Tt:(b + 1) * Tt, :] = y_ref[b]     # current_L
        dcur_ref[b * Tt:(b + 1) * Tt, :] = dy_ref[b]   # its cotangent

    for l in reversed(range(L)):
        d = c.dilations[l]
        o = offs[l]
        for b in range(B):
            fg_dma(l, b).wait()
            dz_dma(l, b).wait()
        fg = fgbuf_ref[l % 2].astype(jnp.float32)
        dz = dzbuf_ref[l % 2].astype(jnp.float32)
        if l >= 2:
            for b in range(B):
                fg_dma(l - 2, b).start()
                dz_dma(l - 2, b).start()

        t_ = jnp.tanh(fg[:, :D])
        s_ = jax.nn.sigmoid(fg[:, D:])
        zz = t_ * s_

        # Grads that read dcur_{l+1} (current content of dcur_ref).
        dwd_c = mxu_dot_tA(zz.astype(cdt), dcur_ref[...].astype(cdt))
        dbd_row = jnp.sum(dcur_ref[...], axis=0, keepdims=True)  # [1, R]

        dz = dz + mxu_dot_tB(dcur_ref[...].astype(cdt), wd_ref[l])

        da_ref[:, 0:D] = dz * s_ * (1.0 - t_ * t_)
        da_ref[:, D:2 * D] = dz * t_ * s_ * (1.0 - s_)

        # Reconstruct current_l (this layer's input).
        cur_ref[...] = (cur_ref[...]
                        - mxu_dot(zz.astype(cdt), wd_ref[l])
                        - bd_ref[l])

        # Packed weight grad: [past | current] columns in one matmul.
        cat_ref[:, R:] = cur_ref[...].astype(cdt)
        for b in range(B):
            r0 = b * Tt
            cat_ref[r0:r0 + d, 0:R] = jnp.zeros((d, R), cat_ref.dtype)
            if d < Tt:
                cat_ref[r0 + d:r0 + Tt, 0:R] = (
                    cur_ref[r0:r0 + Tt - d, :].astype(cdt))
        dw_cat = mxu_dot_tA(cat_ref[...], da_ref[...].astype(cdt))

        # Cross-tile past-tap rows: our tail inputs pair with the LATER
        # tile's da head (left in vcarry by the previous grid step).
        dw0_x = jnp.zeros((R, 2 * D), jnp.float32)
        for b in range(B):
            r0 = b * Tt
            dw0_x += mxu_dot_tA(
                cur_ref[r0 + Tt - d:r0 + Tt, :].astype(cdt),
                vcarry_ref[o:o + d,
                           b * 2 * D:(b + 1) * 2 * D].astype(cdt))

        # dcur_l = residual passthrough + both tap backprops.
        tmp_ref[...] = mxu_dot_tB(da_ref[...].astype(cdt), w_fg_ref[l])
        dcur_ref[...] += tmp_ref[:, R:]
        for b in range(B):
            r0 = b * Tt
            if d < Tt:
                dcur_ref[r0:r0 + Tt - d, :] += tmp_ref[r0 + d:r0 + Tt, 0:R]
            # Consume the later tile's tap-grad carry into our tail,
            # then leave our head rows for the earlier tile.
            dcur_ref[r0 + Tt - d:r0 + Tt, :] += (
                gcarry_ref[o:o + d, b * R:(b + 1) * R])
            gcarry_ref[o:o + d, b * R:(b + 1) * R] = (
                tmp_ref[r0:r0 + d, 0:R])
            vcarry_ref[o:o + d, b * 2 * D:(b + 1) * 2 * D] = (
                da_ref[r0:r0 + d, :])

        # Per-batch add-bias grad rows (GC embeddings need per-b sums).
        for b in range(B):
            dadd_row = jnp.sum(da_ref[b * Tt:(b + 1) * Tt, :], axis=0,
                               keepdims=True)
            @pl.when(first)
            def _(b=b, dadd_row=dadd_row):
                dadd_ref[pl.ds(b, 1), pl.ds(l, 1), :] = dadd_row[None]
            @pl.when(jnp.logical_not(first))
            def _(b=b, dadd_row=dadd_row):
                dadd_ref[pl.ds(b, 1), pl.ds(l, 1), :] += dadd_row[None]

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

    for b in range(B):
        dx_ref[b] = dcur_ref[b * Tt:(b + 1) * Tt, :]


def fused_stack3_backward(y, dy, fg, dz, w_fg, wd, bd,
                          config: WaveNetConfig,
                          compute_dtype=jnp.float32,
                          t_tile: int = _T_TILE_BWD,
                          interpret: bool = False):
    """VJP of the stack from saved (y, fg). ``dz`` is [B, T, L, D].
    Returns (dx, dw_fg [L,2,R,2D], dwd, dadd [L,B,2D], dbd [L,1,R])."""
    c = config
    B, T, R = y.shape
    L, D = c.num_layers, c.dilation_channels
    offs = tap_offsets(c)
    sum_d = sum(c.dilations)
    fg_dtype = fg.dtype
    M = B * t_tile

    T_pad = -(-T // t_tile) * t_tile
    pad_t = lambda a: jnp.pad(
        a, ((0, 0), (0, T_pad - T)) + ((0, 0),) * (a.ndim - 2))
    y_p, dy_p, fg_p = pad_t(y), pad_t(dy), pad_t(fg)
    dz_p = pad_t(dz.astype(fg_dtype))
    n_t = T_pad // t_tile

    kernel = functools.partial(_bwd_kernel, config=c, offs=offs,
                               t_tile=t_tile, n_t=n_t, batch=B)
    rtile = pl.BlockSpec((B, t_tile, R), lambda j: (0, n_t - 1 - j, 0),
                         memory_space=pltpu.VMEM)
    vmem_whole = pl.BlockSpec(memory_space=pltpu.VMEM)
    dx, dw, dwd, dadd, dbd = pl.pallas_call(
        kernel,
        grid=(n_t,),
        in_specs=[rtile, rtile, vmem_whole, vmem_whole, vmem_whole,
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(rtile, vmem_whole, vmem_whole, vmem_whole, vmem_whole),
        out_shape=(
            jax.ShapeDtypeStruct((B, T_pad, R), jnp.float32),
            jax.ShapeDtypeStruct((L, 2, R, 2 * D), jnp.float32),
            jax.ShapeDtypeStruct((L, D, R), jnp.float32),
            jax.ShapeDtypeStruct((B, L, 2 * D), jnp.float32),
            jax.ShapeDtypeStruct((L, 1, R), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((M, R), jnp.float32),               # cur
            pltpu.VMEM((M, R), jnp.float32),               # dcur
            pltpu.VMEM((M, 2 * R), compute_dtype),         # cat
            pltpu.VMEM((M, 2 * D), jnp.float32),           # da
            pltpu.VMEM((M, 2 * R), jnp.float32),           # tmp
            pltpu.VMEM((2, M, 2 * D), fg_dtype),           # fg slots
            pltpu.VMEM((2, M, D), fg_dtype),               # dz slots
            pltpu.VMEM((sum_d, B * R), jnp.float32),       # gcarry
            pltpu.VMEM((sum_d, B * 2 * D), jnp.float32),   # vcarry
            pltpu.SemaphoreType.DMA((2, B)),
            pltpu.SemaphoreType.DMA((2, B)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(y_p, dy_p, w_fg.astype(compute_dtype), wd.astype(compute_dtype),
      bd.astype(jnp.float32), fg_p, dz_p)
    # dadd comes out [B, L, 2D] -> caller layout [L, B, 2D].
    return (dx[:, :T, :], dw, dwd, jnp.moveaxis(dadd, 0, 1), dbd)


# ---------------------------------------------------------------------------
# custom-VJP wrapper: (x, weights) -> (y, z)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def fused_stack3(x, w_fg, wd, add, bd, config: WaveNetConfig,
                 compute_dtype=jnp.float32,
                 t_tile_fwd: int = _T_TILE_FWD,
                 t_tile_bwd: int = _T_TILE_BWD,
                 uniform_add: bool = False,
                 interpret: bool = False):
    """Differentiable whole-stack op. Returns (y [B,T,R], z [B,T,L*D]).

    z comes out of the forward kernel already in head-ready layout — the
    deferred-skip einsum consumes the reshape directly, with no record
    extraction pass.
    """
    fg_dtype = (jnp.bfloat16 if compute_dtype == jnp.bfloat16
                else jnp.float32)
    y, fg, z = fused_stack3_forward(x, w_fg, wd, add, bd, config,
                                    compute_dtype, fg_dtype,
                                    t_tile_fwd, uniform_add, interpret)
    B, T = y.shape[:2]
    return y, z.reshape(B, T, -1)


def _fs3_fwd(x, w_fg, wd, add, bd, config, compute_dtype,
             t_tile_fwd, t_tile_bwd, uniform_add, interpret):
    fg_dtype = (jnp.bfloat16 if compute_dtype == jnp.bfloat16
                else jnp.float32)
    y, fg, z = fused_stack3_forward(x, w_fg, wd, add, bd, config,
                                    compute_dtype, fg_dtype,
                                    t_tile_fwd, uniform_add, interpret)
    B, T = y.shape[:2]
    return (y, z.reshape(B, T, -1)), (y, fg, w_fg, wd, bd)


def _fs3_bwd(config, compute_dtype, t_tile_fwd, t_tile_bwd, uniform_add,
             interpret, res, grads):
    y, fg, w_fg, wd, bd = res
    dy, dz = grads
    B, T = y.shape[:2]
    L, D = config.num_layers, config.dilation_channels
    dx, dw, dwd, dadd, dbd = fused_stack3_backward(
        y, dy, fg, dz.reshape(B, T, L, D), w_fg, wd, bd, config,
        compute_dtype, t_tile_bwd, interpret)
    # dw [L, 2, R, 2D] -> packed w_fg layout [L, 2R, 2D].
    dw_packed = jnp.concatenate([dw[:, 0], dw[:, 1]], axis=1)
    return dx, dw_packed, dwd, dadd, dbd


fused_stack3.defvjp(_fs3_fwd, _fs3_bwd)

__all__ = ["fused_stack3", "fused_stack3_forward", "fused_stack3_backward",
           "pack_stack_weights", "supports"]

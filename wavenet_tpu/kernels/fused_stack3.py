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

* **128-lane packed record streams, one DMA per record.** Mosaic
  requires DMA slices of tiled VMEM buffers to be 128-lane aligned (a
  [Tt, 64] slice of a lane-padded buffer does not compile), so layers
  are packed into 128-lane records: 128/(2D) layers per fg record,
  128/D layers per z record (paper config: 2 and 4). Each completed
  record leaves in ONE strided DMA covering all batches
  ([B, Tt, 128] <-> HBM [B, T, rec, 128]) — L/2 + L/4 DMAs per tile
  instead of v2's per-(layer, batch) traffic.

* **z leaves the kernel head-ready.** The packed z records flatten to
  [B, T, ceil(L/pf)*128] whose first L*D lanes ARE the standard
  [B, T, L*D] layout (only the final record carries zero padding).
  The deferred-skip matmul consumes it directly through zero-row-
  padded skip weights — no record-extraction pass (v2's cost: an XLA
  slice over the biggest tensor in the network, ~1.6 GB/step read+
  write), and the pad rows add zero gradient, so the backward's dz
  stream is the head's cotangent as-is.

* **Records carry fg only** (backward recomputes z = tanh(f)*sigma(g)
  from fg; it needs tanh/sigmoid anyway for the gate gradient).

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
from wavenet_tpu.kernels.stack_pack import pack_stack_weights, tap_offsets

_T_TILE_FWD = 2048
_T_TILE_BWD = 1024
_VMEM_LIMIT = 100 * 1024 * 1024
_LANE = 128


def _rec_shape(width: int) -> Tuple[int, int]:
    """(layers per record, record lane width) for a ``width``-lane
    per-layer payload, subject to Mosaic's 128-lane DMA alignment."""
    if width >= _LANE:
        if width % _LANE:
            raise ValueError(f"payload width {width} not DMA-alignable")
        return 1, width
    if _LANE % width:
        raise ValueError(f"payload width {width} not DMA-alignable")
    return _LANE // width, _LANE


def supports(config: WaveNetConfig, t_tile: int = _T_TILE_BWD) -> bool:
    c = config
    try:
        _rec_shape(2 * c.dilation_channels)
        _rec_shape(c.dilation_channels)
    except ValueError:
        return False
    return (c.filter_width == 2 and max(c.dilations) <= t_tile)


def padded_z_width(config: WaveNetConfig) -> int:
    """Lane width of the padded z output ([B, T, padded_z_width])."""
    pf, rw = _rec_shape(config.dilation_channels)
    return -(-config.num_layers // pf) * rw


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
    pf_f, _ = _rec_shape(2 * D)
    pf_z, _ = _rec_shape(D)
    n_f = -(-L // pf_f)
    n_z = -(-L // pf_z)
    jt = pl.program_id(0)
    Tt = t_tile
    cdt = w_fg_ref.dtype
    t0 = jt * Tt

    @pl.when(jt == 0)
    def _():
        tap_ref[...] = jnp.zeros_like(tap_ref)

    rw_f = fgbuf_ref.shape[-1]
    rw_z = zbuf_ref.shape[-1]

    # Records live in the LANE dim of a 3D HBM array ([B, T, n_rec*rw]):
    # lane slices at rw-multiples are DMA-alignable, whereas a 4D
    # [B, T, n_rec, rw] layout sublane-tiles the record dim and rejects
    # single-record slices.
    def fg_dma(r):
        return pltpu.make_async_copy(
            fgbuf_ref.at[r % 2],
            fg_hbm.at[:, pl.ds(t0, Tt), pl.ds(r * rw_f, rw_f)],
            fsem.at[r % 2])

    def z_dma(r):
        return pltpu.make_async_copy(
            zbuf_ref.at[r % 2],
            z_hbm.at[:, pl.ds(t0, Tt), pl.ds(r * rw_z, rw_z)],
            zsem.at[r % 2])

    for b in range(B):
        cur_ref[b * Tt:(b + 1) * Tt, :] = x_ref[b]

    for l in range(L):
        d = c.dilations[l]
        o = offs[l]
        r_f, o_f = divmod(l, pf_f)
        r_z, o_z = divmod(l, pf_z)
        # The slot's previous record DMA must land before we overwrite.
        if o_f == 0 and r_f >= 2:
            fg_dma(r_f - 2).wait()
        if o_z == 0 and r_z >= 2:
            z_dma(r_z - 2).wait()

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
        for b in range(B):
            fgbuf_ref[r_f % 2, b, :, o_f * 2 * D:(o_f + 1) * 2 * D] = (
                fgs_ref[b * Tt:(b + 1) * Tt, :].astype(fgbuf_ref.dtype))
            zbuf_ref[r_z % 2, b, :, o_z * D:(o_z + 1) * D] = (
                zz[b * Tt:(b + 1) * Tt, :].astype(zbuf_ref.dtype))
        if l == L - 1:
            # Zero the final records' unused sub-slots (every tile: the
            # slot buffer is reused and would hold stale layers).
            if o_f < pf_f - 1:
                fgbuf_ref[r_f % 2, :, :, (o_f + 1) * 2 * D:] = jnp.zeros_like(
                    fgbuf_ref[r_f % 2, :, :, (o_f + 1) * 2 * D:])
            if o_z < pf_z - 1:
                zbuf_ref[r_z % 2, :, :, (o_z + 1) * D:] = jnp.zeros_like(
                    zbuf_ref[r_z % 2, :, :, (o_z + 1) * D:])
        if o_f == pf_f - 1 or l == L - 1:
            fg_dma(r_f).start()
        if o_z == pf_z - 1 or l == L - 1:
            z_dma(r_z).start()

        cur_ref[...] = (cur_ref[...]
                        + mxu_dot(zz.astype(cdt), wd_ref[l])
                        + bd_ref[l])

    for b in range(B):
        y_ref[b] = cur_ref[b * Tt:(b + 1) * Tt, :]
    for r in range(max(0, n_f - 2), n_f):
        fg_dma(r).wait()
    for r in range(max(0, n_z - 2), n_z):
        z_dma(r).wait()


def fused_stack3_forward(x, w_fg, wd, add, bd, config: WaveNetConfig,
                         compute_dtype=jnp.float32, fg_dtype=jnp.float32,
                         t_tile: int = _T_TILE_FWD, uniform_add: bool = False,
                         interpret: bool = False):
    """Whole dilated stack, batch-folded. Returns
    (y [B,T,R] f32, fg records [B,T_pad,n_f*rw_f] fg_dtype,
    z records [B,T_pad,n_z*rw_z] fg_dtype). Records pack
    ``128/payload`` layers into each 128-lane lane group, so the first
    L*payload lanes are the standard per-layer layout and the final
    record's unused sub-slots are zero."""
    c = config
    B, T, R = x.shape
    L, D = c.num_layers, c.dilation_channels
    offs = tap_offsets(c)
    sum_d = sum(c.dilations)
    pf_f, rw_f = _rec_shape(2 * D)
    pf_z, rw_z = _rec_shape(D)
    n_f = -(-L // pf_f)
    n_z = -(-L // pf_z)

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
            jax.ShapeDtypeStruct((B, T_pad, n_f * rw_f), fg_dtype),
            jax.ShapeDtypeStruct((B, T_pad, n_z * rw_z), fg_dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((M, R), jnp.float32),               # cur
            pltpu.VMEM((M, 2 * R), compute_dtype),         # cat
            pltpu.VMEM((M, 2 * D), jnp.float32),           # fgs
            pltpu.VMEM((2, B, t_tile, rw_f), fg_dtype),    # fg record slots
            pltpu.VMEM((2, B, t_tile, rw_z), fg_dtype),    # z record slots
            pltpu.VMEM((sum_d, B * R), jnp.float32),       # tap carry
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(x_p, w_fg.astype(compute_dtype), wd.astype(compute_dtype),
      add.astype(jnp.float32), bd.astype(jnp.float32))
    return y[:, :T, :], fg, z


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------

def _bwd_kernel(y_ref, dy_ref, w_fg_ref, wd_ref, bd_ref,
                fg_hbm, dz_hbm,
                dx_ref, dw_ref, dwd_ref, dadd_ref, dbd_ref,
                cur_ref, dcur_ref, cat_ref, da_ref, tmp_ref,
                fgasm_ref, dzasm_ref,
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
    pf_f, _ = _rec_shape(2 * D)
    pf_z, _ = _rec_shape(D)
    n_f = -(-L // pf_f)
    n_z = -(-L // pf_z)
    jt = pl.program_id(0)          # 0 == LAST time tile (reverse order)
    Tt = t_tile
    cdt = w_fg_ref.dtype
    t0 = (n_t - 1 - jt) * Tt

    rw_f = fgbuf_ref.shape[-1]
    rw_z = dzbuf_ref.shape[-1]

    def fg_dma(r):
        return pltpu.make_async_copy(
            fg_hbm.at[:, pl.ds(t0, Tt), pl.ds(r * rw_f, rw_f)],
            fgbuf_ref.at[r % 2],
            fsem.at[r % 2])

    def dz_dma(r):
        return pltpu.make_async_copy(
            dz_hbm.at[:, pl.ds(t0, Tt), pl.ds(r * rw_z, rw_z)],
            dzbuf_ref.at[r % 2],
            dzsem.at[r % 2])

    @pl.when(jt == 0)
    def _():
        gcarry_ref[...] = jnp.zeros_like(gcarry_ref)
        vcarry_ref[...] = jnp.zeros_like(vcarry_ref)

    first = jt == 0

    # Prefetch the top records of both streams (records are consumed
    # newest-first in the reverse sweep).
    fg_dma(n_f - 1).start()
    if n_f >= 2:
        fg_dma(n_f - 2).start()
    dz_dma(n_z - 1).start()
    if n_z >= 2:
        dz_dma(n_z - 2).start()

    for b in range(B):
        cur_ref[b * Tt:(b + 1) * Tt, :] = y_ref[b]     # current_L
        dcur_ref[b * Tt:(b + 1) * Tt, :] = dy_ref[b]   # its cotangent

    for l in reversed(range(L)):
        d = c.dilations[l]
        o = offs[l]
        r_f, o_f = divmod(l, pf_f)
        r_z, o_z = divmod(l, pf_z)
        if o_f == pf_f - 1 or l == L - 1:
            fg_dma(r_f).wait()
        if o_z == pf_z - 1 or l == L - 1:
            dz_dma(r_z).wait()
        for b in range(B):
            fgasm_ref[b * Tt:(b + 1) * Tt, :] = fgbuf_ref[
                r_f % 2, b, :, o_f * 2 * D:(o_f + 1) * 2 * D].astype(
                    jnp.float32)
            dzasm_ref[b * Tt:(b + 1) * Tt, :] = dzbuf_ref[
                r_z % 2, b, :, o_z * D:(o_z + 1) * D].astype(jnp.float32)

        t_ = jnp.tanh(fgasm_ref[:, :D])
        s_ = jax.nn.sigmoid(fgasm_ref[:, D:])
        zz = t_ * s_

        # Grads that read dcur_{l+1} (current content of dcur_ref).
        dwd_c = mxu_dot_tA(zz.astype(cdt), dcur_ref[...].astype(cdt))
        dbd_row = jnp.sum(dcur_ref[...], axis=0, keepdims=True)  # [1, R]

        dz = (dzasm_ref[...]
              + mxu_dot_tB(dcur_ref[...].astype(cdt), wd_ref[l]))

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

        # Record fully consumed -> refill its slot with the next-lower
        # record (all reads of this record are done).
        if o_f == 0 and r_f >= 2:
            fg_dma(r_f - 2).start()
        if o_z == 0 and r_z >= 2:
            dz_dma(r_z - 2).start()

    for b in range(B):
        dx_ref[b] = dcur_ref[b * Tt:(b + 1) * Tt, :]


def fused_stack3_backward(y, dy, fg, dz, w_fg, wd, bd,
                          config: WaveNetConfig,
                          compute_dtype=jnp.float32,
                          t_tile: int = _T_TILE_BWD,
                          interpret: bool = False):
    """VJP of the stack from saved (y, fg records). ``dz`` is the
    cotangent of the padded z output, [B, T, n_z * rw_z].
    Returns (dx, dw_fg [L,2,R,2D], dwd, dadd [L,B,2D], dbd [L,1,R])."""
    c = config
    B, T, R = y.shape
    L, D = c.num_layers, c.dilation_channels
    offs = tap_offsets(c)
    sum_d = sum(c.dilations)
    fg_dtype = fg.dtype
    pf_f, rw_f = _rec_shape(2 * D)
    pf_z, rw_z = _rec_shape(D)
    n_f = -(-L // pf_f)
    n_z = -(-L // pf_z)
    M = B * t_tile

    T_pad = -(-T // t_tile) * t_tile
    pad_t = lambda a: jnp.pad(
        a, ((0, 0), (0, T_pad - T)) + ((0, 0),) * (a.ndim - 2))
    y_p, dy_p = pad_t(y), pad_t(dy)
    dz_p = pad_t(dz.astype(fg_dtype))
    # fg records may come at the FORWARD's T_pad (a multiple of the
    # forward tile); re-tile to this backward's T_pad.
    if fg.shape[1] < T_pad:
        fg = jnp.pad(fg, ((0, 0), (0, T_pad - fg.shape[1]), (0, 0)))
    elif fg.shape[1] > T_pad:
        fg = fg[:, :T_pad]
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
            pltpu.VMEM((M, 2 * D), jnp.float32),           # fg assembled
            pltpu.VMEM((M, D), jnp.float32),               # dz assembled
            pltpu.VMEM((2, B, t_tile, rw_f), fg_dtype),    # fg record slots
            pltpu.VMEM((2, B, t_tile, rw_z), fg_dtype),    # dz record slots
            pltpu.VMEM((sum_d, B * R), jnp.float32),       # gcarry
            pltpu.VMEM((sum_d, B * 2 * D), jnp.float32),   # vcarry
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(y_p, dy_p, w_fg.astype(compute_dtype), wd.astype(compute_dtype),
      bd.astype(jnp.float32), fg, dz_p)
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
    """Differentiable whole-stack op. Returns
    (y [B,T,R], z_pad [B,T,padded_z_width(config)]).

    ``z_pad[..., :L*D]`` is the standard per-layer gate-output layout;
    the tail lanes are ZERO. Consume it with zero-row-padded skip
    weights (``jnp.pad(w_skip, ((0, K - L*D), (0, 0)))``) — the pad
    rows produce no logits and receive no gradient, so no slicing pass
    over the records is ever needed.
    """
    fg_dtype = (jnp.bfloat16 if compute_dtype == jnp.bfloat16
                else jnp.float32)
    y, fg, z = fused_stack3_forward(x, w_fg, wd, add, bd, config,
                                    compute_dtype, fg_dtype,
                                    t_tile_fwd, uniform_add, interpret)
    B, T = y.shape[:2]
    return y, z[:, :T]


def _fs3_fwd(x, w_fg, wd, add, bd, config, compute_dtype,
             t_tile_fwd, t_tile_bwd, uniform_add, interpret):
    fg_dtype = (jnp.bfloat16 if compute_dtype == jnp.bfloat16
                else jnp.float32)
    y, fg, z = fused_stack3_forward(x, w_fg, wd, add, bd, config,
                                    compute_dtype, fg_dtype,
                                    t_tile_fwd, uniform_add, interpret)
    B, T = y.shape[:2]
    return (y, z[:, :T]), (y, fg, w_fg, wd, bd)


def _fs3_bwd(config, compute_dtype, t_tile_fwd, t_tile_bwd, uniform_add,
             interpret, res, grads):
    y, fg, w_fg, wd, bd = res
    dy, dz = grads
    dx, dw, dwd, dadd, dbd = fused_stack3_backward(
        y, dy, fg, dz, w_fg, wd, bd, config,
        compute_dtype, t_tile_bwd, interpret)
    # dw [L, 2, R, 2D] -> packed w_fg layout [L, 2R, 2D].
    dw_packed = jnp.concatenate([dw[:, 0], dw[:, 1]], axis=1)
    return dx, dw_packed, dwd, dadd, dbd


fused_stack3.defvjp(_fs3_fwd, _fs3_bwd)

__all__ = ["fused_stack3", "fused_stack3_forward", "fused_stack3_backward",
           "pack_stack_weights", "padded_z_width", "supports"]

"""Bisect the v3 forward-stack kernel's time (timing-only variants).

The profiled fwd kernel costs 7.3 ms/step while its matmul floor is
~0.4 ms — this tool toggles the suspected overhead sources off one at a
time (NOT numerically correct; timing only) to find where the time goes:

  full       everything on (should match the real kernel's time)
  noshift    per-batch dilated-tap shift copies off (stale operand)
  nodma      record packing + HBM DMA off
  bare       both off: unshifted cat write + matmuls + act + cur update
  mxu        matmuls + activations only (no cat write, no packing)
  rolled     tap shift via ONE pltpu.roll over [M,R] + per-batch
             boundary fix rows (candidate replacement for the copies)

Usage: python tools/r2_fwd_bisect.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wavenet_tpu.kernels.mxu import mxu_dot
from wavenet_tpu.kernels.stack_pack import pack_stack_weights, tap_offsets
from wavenet_tpu.kernels.fused_stack3 import _rec_shape
from wavenet_tpu.models.config import paper_config
from wavenet_tpu.models.wavenet import init_params

B, SAMPLE = 8, 16000
T_TILE = 1024


def _kernel(x_ref, w_fg_ref, wd_ref,
            y_ref, fg_hbm, z_hbm,
            cur_ref, cat_ref, fgbuf_ref, zbuf_ref, tap_ref,
            fsem, zsem,
            *, config, offs, t_tile, batch,
            shift, dma, cat_write, pack, roll_shift):
    c = config
    L, R, D = c.num_layers, c.residual_channels, c.dilation_channels
    Bq = batch
    pf_f, _ = _rec_shape(2 * D)
    pf_z, _ = _rec_shape(D)
    n_f = -(-L // pf_f)
    n_z = -(-L // pf_z)
    jt = pl.program_id(0)
    Tt = t_tile
    cdt = w_fg_ref.dtype
    t0 = jt * Tt
    rw_f = fgbuf_ref.shape[-1]
    rw_z = zbuf_ref.shape[-1]

    @pl.when(jt == 0)
    def _():
        tap_ref[...] = jnp.zeros_like(tap_ref)

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

    for b in range(Bq):
        cur_ref[b * Tt:(b + 1) * Tt, :] = x_ref[b]

    for l in range(L):
        d = c.dilations[l]
        o = offs[l]
        r_f, o_f = divmod(l, pf_f)
        r_z, o_z = divmod(l, pf_z)
        if dma:
            if o_f == 0 and r_f >= 2:
                fg_dma(r_f - 2).wait()
            if o_z == 0 and r_z >= 2:
                z_dma(r_z - 2).wait()

        if cat_write:
            cat_ref[:, R:] = cur_ref[...].astype(cdt)
        if shift:
            for b in range(Bq):
                r0 = b * Tt
                cat_ref[r0:r0 + d, 0:R] = (
                    tap_ref[o:o + d, b * R:(b + 1) * R].astype(cdt))
                if d < Tt:
                    cat_ref[r0 + d:r0 + Tt, 0:R] = (
                        cur_ref[r0:r0 + Tt - d, :].astype(cdt))
                tap_ref[o:o + d, b * R:(b + 1) * R] = (
                    cur_ref[r0 + Tt - d:r0 + Tt, :])
        elif roll_shift:
            rolled = pltpu.roll(cur_ref[...], d, 0)
            cat_ref[:, 0:R] = rolled.astype(cdt)
            for b in range(Bq):
                r0 = b * Tt
                cat_ref[r0:r0 + d, 0:R] = (
                    tap_ref[o:o + d, b * R:(b + 1) * R].astype(cdt))
                tap_ref[o:o + d, b * R:(b + 1) * R] = (
                    cur_ref[r0 + Tt - d:r0 + Tt, :])

        fgs = mxu_dot(cat_ref[...], w_fg_ref[l])
        zz = jnp.tanh(fgs[:, :D]) * jax.nn.sigmoid(fgs[:, D:])
        if pack:
            for b in range(Bq):
                fgbuf_ref[r_f % 2, b, :, o_f * 2 * D:(o_f + 1) * 2 * D] = (
                    fgs[b * Tt:(b + 1) * Tt, :].astype(fgbuf_ref.dtype))
                zbuf_ref[r_z % 2, b, :, o_z * D:(o_z + 1) * D] = (
                    zz[b * Tt:(b + 1) * Tt, :].astype(zbuf_ref.dtype))
        if dma:
            if o_f == pf_f - 1 or l == L - 1:
                fg_dma(r_f).start()
            if o_z == pf_z - 1 or l == L - 1:
                z_dma(r_z).start()

        cur_ref[...] = cur_ref[...] + mxu_dot(zz.astype(cdt), wd_ref[l])

    for b in range(Bq):
        y_ref[b] = cur_ref[b * Tt:(b + 1) * Tt, :]
    if dma:
        for r in range(max(0, n_f - 2), n_f):
            fg_dma(r).wait()
        for r in range(max(0, n_z - 2), n_z):
            z_dma(r).wait()


def build(cfg, variant):
    flags = dict(shift=False, dma=False, cat_write=False, pack=False,
                 roll_shift=False)
    if variant == "full":
        flags.update(shift=True, dma=True, cat_write=True, pack=True)
    elif variant == "noshift":
        flags.update(dma=True, cat_write=True, pack=True)
    elif variant == "nodma":
        flags.update(shift=True, cat_write=True)
    elif variant == "bare":
        flags.update(cat_write=True)
    elif variant == "mxu":
        pass
    elif variant == "rolled":
        flags.update(roll_shift=True, dma=True, cat_write=True, pack=True)
    elif variant == "rolled_nodma":
        flags.update(roll_shift=True, cat_write=True)
    else:
        raise ValueError(variant)

    c = cfg
    R, D, L = c.residual_channels, c.dilation_channels, c.num_layers
    offs = tap_offsets(c)
    sum_d = sum(c.dilations)
    pf_f, rw_f = _rec_shape(2 * D)
    pf_z, rw_z = _rec_shape(D)
    n_f = -(-L // pf_f)
    n_z = -(-L // pf_z)
    Tt = T_TILE
    M = B * Tt

    def fwd(x, w_fg, wd):
        T = x.shape[1]
        T_pad = -(-T // Tt) * Tt
        x_p = jnp.pad(x, ((0, 0), (0, T_pad - T), (0, 0)))
        n_t = T_pad // Tt
        kernel = functools.partial(
            _kernel, config=c, offs=offs, t_tile=Tt, batch=B, **flags)
        tile_r = pl.BlockSpec((B, Tt, R), lambda j: (0, j, 0),
                              memory_space=pltpu.VMEM)
        y, fg, z = pl.pallas_call(
            kernel,
            grid=(n_t,),
            in_specs=[tile_r] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=(tile_r, pl.BlockSpec(memory_space=pl.ANY),
                       pl.BlockSpec(memory_space=pl.ANY)),
            out_shape=(
                jax.ShapeDtypeStruct((B, T_pad, R), jnp.float32),
                jax.ShapeDtypeStruct((B, T_pad, n_f * rw_f), jnp.bfloat16),
                jax.ShapeDtypeStruct((B, T_pad, n_z * rw_z), jnp.bfloat16),
            ),
            scratch_shapes=[
                pltpu.VMEM((M, R), jnp.float32),
                pltpu.VMEM((M, 2 * R), jnp.bfloat16),
                pltpu.VMEM((2, B, Tt, rw_f), jnp.bfloat16),
                pltpu.VMEM((2, B, Tt, rw_z), jnp.bfloat16),
                pltpu.VMEM((sum_d, B * R), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x_p, w_fg.astype(jnp.bfloat16), wd.astype(jnp.bfloat16))
        return jnp.sum(y)

    return jax.jit(fwd)


def main():
    print("device:", jax.devices()[0], flush=True)
    cfg = paper_config(compute_dtype="bfloat16")
    params = init_params(jax.random.PRNGKey(0), cfg)
    T = cfg.receptive_field + SAMPLE
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T, cfg.residual_channels)
                    .astype(np.float32))
    w_fg, wd, _, _ = pack_stack_weights(params, cfg, None, B)

    for variant in ["mxu", "bare", "nodma", "noshift", "rolled_nodma",
                    "rolled", "full"]:
        try:
            fn = build(cfg, variant)
            out = fn(x, w_fg, wd)
            _ = float(jax.device_get(out))
            times = []
            for _i in range(3):
                t0 = time.perf_counter()
                for _j in range(10):
                    out = fn(x, w_fg, wd)
                _ = float(jax.device_get(out))
                times.append((time.perf_counter() - t0) / 10)
            print(f"[{variant:13s}] median {np.median(times)*1e3:7.2f} ms "
                  f"({[round(t*1e3,1) for t in times]})", flush=True)
        except Exception as e:
            print(f"[{variant:13s}] FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()

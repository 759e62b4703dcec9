"""Second fwd-kernel bisect: core-math variants (timing only).

Bisect #1 showed the matmul+activation core is ~93% of the fwd kernel
(6.75 of 7.3 ms) — shifts/DMA/packing are nearly free. This round
isolates the core's components and times the candidate redesigns:

  base       fg matmul (K=64) + tanh+sigmoid + dense matmul  (bisect#1 'mxu')
  mm_only    both matmuls, activations replaced by a cheap mul
  act_only   tanh+sigmoid only (no matmuls)
  one_tanh   fg matmul + ONE tanh over [M,2D] (sigmoid via tanh) + dense
  fat        ONE K=128 matmul/layer ([cur_p|cur|z_p|z] @ [128,96] emitting
             fg and cur via an identity block) + tanh+sigmoid
  fat_1t     fat + one-tanh trick

Usage: python tools/r2_fwd_bisect2.py
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
from wavenet_tpu.models.config import paper_config

B, SAMPLE = 8, 16000
T_TILE = 1024


def _kernel(x_ref, w_fg_ref, wd_ref, wfat_ref,
            y_ref,
            cur_ref, cat_ref, fat_ref,
            *, config, t_tile, batch, variant):
    c = config
    L, R, D = c.num_layers, c.residual_channels, c.dilation_channels
    Tt = t_tile
    cdt = w_fg_ref.dtype

    for b in range(batch):
        cur_ref[b * Tt:(b + 1) * Tt, :] = x_ref[b]

    if variant in ("fat", "fat_1t"):
        # One [M,128] x [128, 96+pad] matmul per layer: lanes 0:2R are
        # [past|cur], 2R:2R+2D are [past_z|z]; output 0:2D = fg,
        # 2D:2D+R = cur_next. (Timing-only: shifts omitted — bisect#1
        # showed they cost ~0.5 ms total; operand reuse is realistic.)
        fat_ref[:, R:2 * R] = cur_ref[...].astype(cdt)
        for l in range(L):
            out = mxu_dot(fat_ref[...], wfat_ref[l])
            fgs = out[:, :2 * D]
            if variant == "fat_1t":
                th = jnp.tanh(fgs)
                zz = th[:, :D] * (0.5 + 0.5 * th[:, D:])
            else:
                zz = jnp.tanh(fgs[:, :D]) * jax.nn.sigmoid(fgs[:, D:])
            fat_ref[:, R:2 * R] = out[:, 2 * D:2 * D + R].astype(cdt)
            fat_ref[:, 2 * R + D:] = zz.astype(cdt)
        cur_ref[...] = fat_ref[:, R:2 * R].astype(jnp.float32)
    else:
        for l in range(L):
            fgs = mxu_dot(cat_ref[...], w_fg_ref[l])
            if variant == "base":
                zz = jnp.tanh(fgs[:, :D]) * jax.nn.sigmoid(fgs[:, D:])
            elif variant == "mm_only":
                zz = fgs[:, :D] * fgs[:, D:]
            elif variant == "one_tanh":
                th = jnp.tanh(fgs)
                zz = th[:, :D] * (0.5 + 0.5 * th[:, D:])
            elif variant == "act_only":
                zz = (jnp.tanh(cur_ref[...])
                      * jax.nn.sigmoid(cur_ref[...]))[:, :D]
            if variant == "act_only":
                cur_ref[...] += jnp.pad(zz, ((0, 0), (0, R - D))) \
                    if D < R else zz[:, :R]
            else:
                cur_ref[...] = cur_ref[...] + mxu_dot(
                    zz.astype(cdt), wd_ref[l])

    for b in range(batch):
        y_ref[b] = cur_ref[b * Tt:(b + 1) * Tt, :]


def build(cfg, variant):
    c = cfg
    R, D, L = c.residual_channels, c.dilation_channels, c.num_layers
    Tt = T_TILE
    M = B * Tt
    NF = 2 * D + R          # fat output width (96)
    NFP = 128               # padded

    def fwd(x, w_fg, wd, wfat):
        T = x.shape[1]
        T_pad = -(-T // Tt) * Tt
        x_p = jnp.pad(x, ((0, 0), (0, T_pad - T), (0, 0)))
        n_t = T_pad // Tt
        kernel = functools.partial(
            _kernel, config=c, t_tile=Tt, batch=B, variant=variant)
        tile_r = pl.BlockSpec((B, Tt, R), lambda j: (0, j, 0),
                              memory_space=pltpu.VMEM)
        y = pl.pallas_call(
            kernel,
            grid=(n_t,),
            in_specs=[tile_r] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=tile_r,
            out_shape=jax.ShapeDtypeStruct((B, T_pad, R), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((M, R), jnp.float32),
                pltpu.VMEM((M, 2 * R), jnp.bfloat16),
                pltpu.VMEM((M, 2 * R + 2 * D), jnp.bfloat16),
            ],
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x_p, w_fg.astype(jnp.bfloat16), wd.astype(jnp.bfloat16),
          wfat.astype(jnp.bfloat16))
        return jnp.sum(y)

    return jax.jit(fwd)


def main():
    print("device:", jax.devices()[0], flush=True)
    cfg = paper_config(compute_dtype="bfloat16")
    c = cfg
    R, D, L = c.residual_channels, c.dilation_channels, c.num_layers
    T = cfg.receptive_field + SAMPLE
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T, R).astype(np.float32))
    w_fg = jnp.asarray(rng.randn(L, 2 * R, 2 * D).astype(np.float32)) * 0.05
    wd = jnp.asarray(rng.randn(L, D, R).astype(np.float32)) * 0.05
    wfat = jnp.asarray(
        rng.randn(L, 2 * R + 2 * D, 2 * D + R).astype(np.float32)) * 0.05

    # (base/mm_only/act_only/one_tanh measured 2026-08-17: 6.57 / 5.77 /
    # 6.60 / 5.76 ms — one tanh hides fully under the MXU; the serial
    # matmul chain is the remaining floor. Now: fat variants + M scaling.)
    for variant, tt in [("fat", 1024), ("fat_1t", 1024),
                        ("one_tanh", 2048), ("fat_1t", 2048),
                        ("mm_only", 2048)]:
        global T_TILE
        T_TILE = tt
        variant = variant
        try:
            fn = build(cfg, variant)
            out = fn(x, w_fg, wd, wfat)
            _ = float(jax.device_get(out))
            times = []
            for _i in range(3):
                t0 = time.perf_counter()
                for _j in range(10):
                    out = fn(x, w_fg, wd, wfat)
                _ = float(jax.device_get(out))
                times.append((time.perf_counter() - t0) / 10)
            print(f"[{variant:9s} Tt={tt:4d}] median "
                  f"{np.median(times)*1e3:7.2f} ms "
                  f"({[round(t*1e3,1) for t in times]})", flush=True)
        except Exception as e:
            print(f"[{variant:9s} Tt={tt:4d}] FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()

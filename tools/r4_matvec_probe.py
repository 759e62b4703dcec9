"""Probe: can VPU matvecs beat MXU matmuls on the b=1 decode chain?

The b=1 sampler step is latency-bound by ~60 dependent [1,64]@[64,64]-ish
MXU matmuls (tools/r3_b1_bisect.py: mm_only = 14.0 of 15.25 us/step).
Each MXU pass costs ~107-233 ns of pipeline latency regardless of size.
At B=1 a matmul is a matvec, which the VPU can compute as a
broadcast-multiply + reduce — if Mosaic lowers the broadcast and the
lane/sublane reduction without relayouts, the per-op latency could be
well under the MXU's.

Trick to avoid transposes in the chain: alternate vector layouts.
  row->col:  y_col[j] = sum_k x_row[k] * WT[j, k]   (reduce over LANES;
             x_row [1,64] broadcast over sublanes of WT [64,64])
  col->row:  y_row[j] = sum_k x_col[k] * W[k, j]    (reduce over SUBLANES;
             x_col [64,1] broadcast over lanes of W [64,64])
Two chained products return to the original layout — exactly one fg +
one dense product per WaveNet layer. No transposes anywhere.

Variants (each = 16000 outer steps x L chained products, semantics fake):
  mxu        chain of L row-form MXU matmuls (the current kernel's shape)
  vpu        alternating row/col VPU broadcast-reduce products
  vpu_tanh   same + tanh between products (the real chain has one)
  mxu_tanh   MXU chain + tanh

Run alone — one TPU process at a time.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wavenet_tpu.kernels.mxu import mxu_dot

C = 64          # chain width (fg matmul width in the paper config)
L = 60          # chained products per step (30 fg + 30 dense)
N_STEPS = 16000


def make_kernel(mode):
    def kernel(w_ref, wt_ref, out_ref):
        def product_row_mxu(x_row, i):
            return mxu_dot(x_row, w_ref[i])

        def product_row_to_col(x_row, i):
            # [1,C] x [C,C] -> [C,1]: broadcast x over sublanes of WT,
            # reduce over lanes.
            prod = x_row * wt_ref[i]            # [C(sub j), C(lane k)]
            return jnp.sum(prod, axis=1, keepdims=True)   # [C,1]

        def product_col_to_row(x_col, i):
            # [C,1] x [C,C] -> [1,C]: broadcast x over lanes of W,
            # reduce over sublanes.
            prod = x_col * w_ref[i]             # [C(sub k), C(lane j)]
            return jnp.sum(prod, axis=0, keepdims=True)   # [1,C]

        def body(t, x_row):
            if mode in ("mxu", "mxu_tanh"):
                for i in range(L):
                    x_row = product_row_mxu(x_row, i)
                    if mode == "mxu_tanh" and i % 2 == 0:
                        x_row = jnp.tanh(x_row)
                    x_row = x_row * 0.25
            else:
                x = x_row
                for i in range(0, L, 2):
                    x_col = product_row_to_col(x, i)
                    if mode == "vpu_tanh":
                        x_col = jnp.tanh(x_col)
                    x_col = x_col * 0.25
                    x = product_col_to_row(x_col, i + 1)
                    x = x * 0.25
                x_row = x
            return x_row

        x0 = jnp.full((1, C), 0.01, jnp.float32)
        out_ref[...] = lax.fori_loop(0, N_STEPS, body, x0, unroll=False)

    return kernel


@functools.partial(jax.jit, static_argnames=("mode",))
def run(w, wt, mode):
    kernel = make_kernel(mode)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, C), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(w, wt)


def timed(fn, reps=3):
    np.asarray(jax.device_get(fn()))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        _ = np.asarray(jax.device_get(out)).sum()
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.uniform(-0.1, 0.1, (L, C, C)).astype(np.float32))
    wt = jnp.transpose(w, (0, 2, 1))

    for mode in ["mxu", "vpu", "mxu_tanh", "vpu_tanh"]:
        try:
            dt = timed(lambda m=mode: run(w, wt, m))
        except Exception as e:  # noqa: BLE001
            print(f"{mode:10s} FAILED: {type(e).__name__}: {e}")
            continue
        us = dt / N_STEPS * 1e6
        per_op = us / L * 1e3
        print(f"{mode:10s} {dt*1e3:8.1f} ms  {us:6.2f} us/step  "
              f"{per_op:6.1f} ns/product")


if __name__ == "__main__":
    main()

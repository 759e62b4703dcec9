"""Attribute the b=1 sampler step latency op-by-op (ablation bisect).

The VMEM sampler at b=1 runs ~21 us/step (f32) / ~18.4 (bf16w) on the
2026-08-17 tunnel — a serial chain of ~62 dependent matmuls plus VPU
ops. bf16 weights only save ~14%, so MXU pass COUNT is not the story;
per-op latency is. This tool times ablated kernel variants (semantics
intentionally broken; only the dependency structure matters) to find
which chain ops dominate:

  full        the real kernel
  no_skip     skip matmul removed (off-chain work cost)
  no_dense    dense matmul removed from the chain
  no_fg       filter/gate matmul removed
  no_tanh     transcendental removed
  no_ring     ring read/write removed (past = current)
  no_head     postprocess matmuls removed
  no_feat     one-hot featurize + causal matmul removed
  mm_only     chain = fg+dense matmuls only (floor)

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
from wavenet_tpu.kernels.sampler import (
    pack_sampler_weights, ring_offsets, _VMEM_LIMIT)
from wavenet_tpu.models.config import paper_config
from wavenet_tpu.models.wavenet import init_params

B = 1
N_STEPS = 16000


def make_kernel(config, mode):
    c = config
    offsets = ring_offsets(c)
    L, R, D, S, Q = (c.num_layers, c.residual_channels, c.dilation_channels,
                     c.skip_channels, c.quantization_channels)
    C_in = c.input_channels

    def kernel(seed_ref, causal_w_ref, layer_w_ref, layer_add_ref,
               dense_w_ref, dense_add_ref, skip_w_ref, skip_b_ref,
               post1_w_ref, post1_b_ref, post2_w_ref, post2_b_ref,
               codes_ref, ring_ref, causal_buf_ref):
        pltpu.prng_seed(seed_ref[0])
        ring_ref[...] = jnp.zeros_like(ring_ref)
        causal_buf_ref[...] = jnp.zeros_like(causal_buf_ref)

        def featurize(x_col):
            iota = lax.broadcasted_iota(jnp.int32, (B, C_in), 1)
            return (iota.astype(jnp.float32) == x_col).astype(jnp.float32)

        def step(t, x_col):
            if mode == "no_feat":
                current = x_col * jnp.ones((B, R), jnp.float32)
            else:
                x = featurize(x_col)
                prev = causal_buf_ref[...]
                window = jnp.concatenate([prev, x], axis=-1)
                current = mxu_dot(window.astype(causal_w_ref.dtype),
                                  causal_w_ref[...])
                causal_buf_ref[...] = window[:, C_in:]

            skip_sum = jnp.zeros((B, S), jnp.float32)
            for i, dilation in enumerate(c.dilations):
                if mode == "no_ring" or mode == "mm_only":
                    past = current
                else:
                    pos = offsets[i] + t % dilation
                    past = ring_ref[pos].astype(jnp.float32)
                    ring_ref[pos] = current.astype(ring_ref.dtype)
                if mode == "no_fg":
                    fg = jnp.concatenate([past, current], axis=-1)
                else:
                    x_cat = jnp.concatenate([past, current], axis=-1)
                    fg = mxu_dot(x_cat.astype(layer_w_ref.dtype),
                                 layer_w_ref[i])
                    fg = fg + layer_add_ref[i]
                if mode == "no_tanh" or mode == "mm_only":
                    out = fg[:, :D] + fg[:, D:]
                else:
                    tg = jnp.tanh(fg)
                    out = tg[:, :D] * (0.5 + 0.5 * tg[:, D:])
                if mode == "no_dense":
                    current = current + out[:, :R]
                else:
                    d = mxu_dot(out.astype(dense_w_ref.dtype),
                                dense_w_ref[i])
                    current = current + d + dense_add_ref[i]
                if mode != "no_skip" and mode != "mm_only":
                    skip_sum = skip_sum + mxu_dot(
                        out.astype(skip_w_ref.dtype), skip_w_ref[i])

            if mode == "no_head" or mode == "mm_only":
                return jnp.broadcast_to(current[:, :1], (B, Q))
            h = jnp.maximum(skip_sum + skip_b_ref[...], 0.0)
            h = (mxu_dot(h.astype(post1_w_ref.dtype), post1_w_ref[...])
                 + post1_b_ref[...])
            h = jnp.maximum(h, 0.0)
            h = (mxu_dot(h.astype(post2_w_ref.dtype), post2_w_ref[...])
                 + post2_b_ref[...])
            return h

        def sample_from(logits):
            if mode == "no_sample":
                # Keep a data dependence on logits so nothing dead-codes.
                return jnp.argmax(logits, axis=-1,
                                  keepdims=True).astype(jnp.int32)
            bits = pltpu.prng_random_bits((B, Q))
            u = pltpu.bitcast(
                (pltpu.bitcast(bits, jnp.uint32) >> 9) | 0x3F800000,
                jnp.float32) - 1.0
            u = jnp.maximum(u, 1e-20)
            gumbel = -jnp.log(-jnp.log(u))
            return jnp.argmax(logits + gumbel, axis=-1,
                              keepdims=True).astype(jnp.int32)

        def body(t, x_col):
            logits = step(t, x_col)
            sampled = sample_from(logits)
            codes_ref[0, pl.ds(t, 1), :] = jnp.transpose(sampled)
            return sampled.astype(jnp.float32)

        first = jnp.full((B, 1), Q // 2, jnp.float32)
        lax.fori_loop(0, N_STEPS, body, first, unroll=False)

    return kernel


@functools.partial(jax.jit, static_argnames=("config", "mode"))
def run(packed, seed, config, mode):
    c = config
    sum_d = sum(c.dilations)
    kernel = make_kernel(c, mode)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 11,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((sum_d, B, c.residual_channels), jnp.float32),
            pltpu.VMEM((B, c.input_channels), jnp.float32),
        ])
    codes = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, N_STEPS, B), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
    )(seed, packed.causal_w, packed.layer_w, packed.layer_add,
      packed.dense_w, packed.dense_add, packed.skip_w, packed.skip_b,
      packed.post1_w, packed.post1_b, packed.post2_w, packed.post2_b)
    return codes


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
    config = paper_config()
    params = init_params(jax.random.PRNGKey(0), config)
    wd = (jnp.bfloat16 if "--bf16" in sys.argv else jnp.float32)
    packed = pack_sampler_weights(params, config, B, weight_dtype=wd)
    seed = jnp.asarray([7], jnp.int32)

    modes = ["full", "no_skip", "no_dense", "no_fg", "no_tanh", "no_ring",
             "no_head", "no_sample", "no_feat", "mm_only"]
    results = {}
    for mode in modes:
        try:
            dt = timed(lambda m=mode: run(packed, seed, config, m))
        except Exception as e:  # noqa: BLE001
            print(f"{mode:10s} FAILED: {type(e).__name__}: {e}")
            continue
        results[mode] = dt
        us = dt / N_STEPS * 1e6
        delta = ""
        if mode != "full" and "full" in results:
            delta = f"  (saves {(results['full'] - dt)/N_STEPS*1e6:5.2f} us)"
        print(f"{mode:10s} {dt*1e3:8.1f} ms  {us:6.2f} us/step{delta}")


if __name__ == "__main__":
    main()

"""Whole-train-step timing after the r2 XLA-path changes.

The step profile (tools/r2_profile.py) shows ~3.7 ms/step of op-gap
overhead (~1200 ops x ~3 us issue cost) that is flat in batch/chunk
size, plus matmul work that scales. This sweep measures audio-s/s
across (batch, sample_size) to find the throughput-optimal shape and
the amortization curve.

Context (v5-lite, paper config bf16): b8/16k step was 19.37 ms before
the gather/scatter fixes, 14.92 ms after (536 audio-s/s).

Usage: python tools/r2_step_experiments.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from wavenet_tpu.models.config import paper_config
from wavenet_tpu.models.wavenet import init_params, loss_fn
from wavenet_tpu.ops.optimizers import create_adam_optimizer


def timed(tag, fn, *args, reps=3, calls=10, audio_s=1.0):
    out = fn(*args)
    _ = np.asarray(jax.device_get(jax.tree.leaves(out)[0])).sum()
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(calls):
            out = fn(*args)
        _ = np.asarray(jax.device_get(jax.tree.leaves(out)[0])).sum()
        times.append((time.perf_counter() - t0) / calls)
    dt = float(np.median(times))
    print(f"[{tag}] median {dt*1e3:7.2f} ms  ({audio_s/dt:6.0f} audio-s/s) "
          f"({[round(t*1e3,1) for t in times]})", flush=True)
    return dt


def main():
    print("device:", jax.devices()[0], flush=True)
    cfg = paper_config(compute_dtype="bfloat16")
    params0 = init_params(jax.random.PRNGKey(0), cfg)
    opt = create_adam_optimizer(1e-3)
    rng = np.random.RandomState(0)

    for b, sample in [(8, 16000), (16, 16000), (32, 16000),
                      (8, 48000), (16, 48000), (64, 16000),
                      (8, 100000)]:
        tag = f"b{b}_s{sample//1000}k"
        try:
            T = cfg.receptive_field + sample
            audio = jnp.asarray(
                rng.uniform(-1, 1, (b, T)).astype(np.float32))
            opt_state = opt.init(params0)

            @jax.jit
            def step(params, opt_state, audio):
                (l, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(
                    params, cfg, audio)
                updates, opt_state = opt.update(g, opt_state, params)
                return optax.apply_updates(params, updates), opt_state, l

            timed(tag, step, params0, opt_state, audio,
                  audio_s=b * sample / 16000.0)
        except Exception as e:
            print(f"[{tag}] FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()

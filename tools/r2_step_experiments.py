"""Whole-train-step timing after the r2 XLA-path changes.

Measures on the real chip (paper config, b8, 16000-sample chunks, bf16):
  step_base      loss_fn as committed (merged fg + head_from slicing)
  step_onetanh   + sigmoid-via-tanh in the stack (one transcendental
                 over [.., 2D] instead of tanh+sigmoid over [.., D] each;
                 tests whether XLA's elementwise is occupancy-bound like
                 the Pallas kernels were)
Context (tools/r2_xla_analysis.py, 2026-08-17): full step 18.54 ms,
stack-only fwd+bwd 7.45 ms, head-only fwd+bwd 8.45 ms.

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

B, SAMPLE = 8, 16000


def timed(tag, fn, *args, reps=3, calls=10):
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
    aud = B * SAMPLE / 16000.0 / dt
    print(f"[{tag}] median {dt*1e3:.2f} ms  ({aud:.0f} audio-s/s) "
          f"({[round(t*1e3,1) for t in times]})", flush=True)
    return dt


def main():
    print("device:", jax.devices()[0], flush=True)
    for tag, kw in [("step_base", {}),
                    ("step_onetanh", {"one_tanh_gate": True})]:
        try:
            cfg = paper_config(compute_dtype="bfloat16", **kw)
        except TypeError as e:
            print(f"[{tag}] SKIP (config): {e}", flush=True)
            continue
        params = init_params(jax.random.PRNGKey(0), cfg)
        opt = create_adam_optimizer(1e-3)
        opt_state = opt.init(params)
        T = cfg.receptive_field + SAMPLE
        rng = np.random.RandomState(0)
        audio = jnp.asarray(rng.uniform(-1, 1, (B, T)).astype(np.float32))

        @jax.jit
        def step(params, opt_state, audio):
            (l, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(
                params, cfg, audio)
            updates, opt_state = opt.update(g, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, l

        timed(tag, step, params, opt_state, audio)


if __name__ == "__main__":
    main()

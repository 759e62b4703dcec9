"""Re-measure the BASELINE.md non-paper training configs after the
round-2 XLA-path fixes (CE one-hot, embed matmul-VJP, head_from).

Round-1 numbers: gc 114 (b2 bf16), wide 25.4 (b2 bf16, scalar),
sharded-80L-single-chip 6.7 (b1 bf16+remat).

Usage: python tools/r2_config_bench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from wavenet_tpu.models.config import WaveNetConfig, paper_config
from wavenet_tpu.models.wavenet import init_params, loss_fn
from wavenet_tpu.ops.optimizers import create_adam_optimizer

SAMPLE = 16000


def timed(tag, fn, *args, reps=3, calls=5, audio_s=1.0):
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
    print(f"[{tag}] median {dt*1e3:8.2f} ms  ({audio_s/dt:6.1f} audio-s/s)",
          flush=True)


def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.RandomState(0)
    cases = [
        ("gc_b2", paper_config(compute_dtype="bfloat16", gc_channels=32,
                               gc_cardinality=109), 2, True),
        ("wide_b2", WaveNetConfig(
            dilations=tuple([2 ** i for i in range(10)] * 5),
            residual_channels=64, dilation_channels=64, skip_channels=1024,
            scalar_input=True, initial_filter_width=32,
            compute_dtype="bfloat16"), 2, False),
        ("sharded80_b1", WaveNetConfig(
            dilations=tuple([2 ** i for i in range(10)] * 8),
            residual_channels=256, dilation_channels=256,
            skip_channels=512, compute_dtype="bfloat16", remat=True),
         1, False),
    ]
    for tag, cfg, b, gc in cases:
        try:
            params = init_params(jax.random.PRNGKey(0), cfg)
            opt = create_adam_optimizer(1e-3)
            opt_state = opt.init(params)
            T = cfg.receptive_field + SAMPLE
            audio = jnp.asarray(
                rng.uniform(-1, 1, (b, T)).astype(np.float32))
            gc_ids = jnp.arange(b, dtype=jnp.int32) if gc else None

            @jax.jit
            def step(params, opt_state, audio, gc_ids):
                (l, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(
                    params, cfg, audio, gc_ids)
                updates, opt_state = opt.update(g, opt_state, params)
                return optax.apply_updates(params, updates), opt_state, l

            timed(tag, step, params, opt_state, audio, gc_ids,
                  audio_s=b * SAMPLE / 16000.0)
        except Exception as e:
            print(f"[{tag}] FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()

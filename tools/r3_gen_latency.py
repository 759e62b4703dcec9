"""Round-3 generation latency study: where do the 15 us/sample at b=1 go?

Measures the fused Pallas VMEM sampler (paper config) across weight
dtypes and the fast-math kernel variants (split dense/skip projection,
single-tanh gating), plus the HBM-ring b64 path. All timings amortize
>= 3 kernel launches of 16k samples per readback (axon relay adds ~30 ms
per readback; see docs/performance.md).

Run alone — one TPU process at a time.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from wavenet_tpu.models.config import paper_config
from wavenet_tpu.models.wavenet import init_params
from wavenet_tpu.kernels.sampler import generate_pallas


def timed(fn, reps=3):
    np.asarray(jax.device_get(fn()))  # compile + warm
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
    n = 16000

    cases = [
        ("b1 f32", dict(batch_size=1)),
        ("b1 bf16w", dict(batch_size=1, weight_dtype=jnp.bfloat16)),
        ("b8 f32", dict(batch_size=8)),
        ("b8 bf16w", dict(batch_size=8, weight_dtype=jnp.bfloat16)),
        ("b64 hbm bf16w", dict(batch_size=64, ring_in_hbm=True,
                               weight_dtype=jnp.bfloat16)),
        ("b128 stream bf16w", dict(batch_size=128, ring_in_hbm=True,
                                   stream_io=True,
                                   weight_dtype=jnp.bfloat16)),
        ("b1 f32 prefill", dict(batch_size=1, prefill=True)),
        ("b1 bf16w prefill", dict(batch_size=1, prefill=True,
                                  weight_dtype=jnp.bfloat16)),
        ("b8 f32 prefill", dict(batch_size=8, prefill=True)),
        ("b64 bf16w prefill", dict(batch_size=64, prefill=True,
                                   weight_dtype=jnp.bfloat16)),
        ("b128 bf16w prefill", dict(batch_size=128, prefill=True,
                                    weight_dtype=jnp.bfloat16)),
    ]
    for name, kw in cases:
        try:
            dt = timed(lambda kw=kw: generate_pallas(
                params, config, n, seed=2, **kw))
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"{name:24s} FAILED: {type(e).__name__}: {e}")
            continue
        b = kw.get("batch_size", 1)
        rate = b * n / dt
        print(f"{name:24s} {dt*1e3:8.1f} ms  {rate:12.0f} samples/s  "
              f"{dt/n*1e6:6.2f} us/step")


if __name__ == "__main__":
    main()

"""Round-4 probe: is device_put or fresh-input dispatch slow on the tunnel?

The r4_cli_overhead run showed 2.2 s/step with ALL of it surfacing at
the lagged device_get — device compute is 15.7 ms, so either the
transfer of fresh inputs or the execution-on-fresh-buffers path is
pathologically slow. This isolates each: put+block, put-only enqueue,
dispatch on reused vs fresh buffers, with/without NamedSharding.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from wavenet_tpu.parallel.sharding import make_mesh

mesh = make_mesh()
sharding = NamedSharding(mesh, P("data", None))
x = np.random.randn(8, 19071).astype(np.float32)

# 1. plain device_put + block
for tag, put in [("plain", lambda a: jax.device_put(a)),
                 ("named_sharding", lambda a: jax.device_put(a, sharding))]:
    d = put(x); jax.block_until_ready(d)  # warm
    t0 = time.perf_counter()
    for _ in range(10):
        d = put(x)
        jax.block_until_ready(d)
    dt = (time.perf_counter() - t0) / 10
    print(f"device_put[{tag}] put+block: {dt*1e3:.2f} ms "
          f"({x.nbytes/dt/1e6:.0f} MB/s)")

# 2. dispatch a matmul-ish jit on reused vs fresh inputs
w = jax.device_put(np.random.randn(19071, 256).astype(np.float32))

@jax.jit
def f(a, w):
    return jnp.tanh(a @ w).sum()

d = jax.device_put(x, sharding)
jax.block_until_ready(f(d, w))
t0 = time.perf_counter()
for _ in range(20):
    r = f(d, w)
jax.block_until_ready(r)
print(f"dispatch reused input: {(time.perf_counter()-t0)/20*1e3:.2f} ms")

t0 = time.perf_counter()
for _ in range(20):
    d2 = jax.device_put(x, sharding)
    r = f(d2, w)
jax.block_until_ready(r)
print(f"dispatch fresh-put input: {(time.perf_counter()-t0)/20*1e3:.2f} ms")

t0 = time.perf_counter()
for _ in range(20):
    d2 = jax.device_put(x)
    r = f(d2, w)
jax.block_until_ready(r)
print(f"dispatch fresh plain-put input: "
      f"{(time.perf_counter()-t0)/20*1e3:.2f} ms")

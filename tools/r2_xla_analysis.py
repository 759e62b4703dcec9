"""XLA-side analysis: stack-only vs head cost split + optimized HLO.

1. Times the XLA train-step pieces so the Pallas budget is known:
     - full train step (reference point)
     - stack-only fwd+bwd (exactly what fused_stack3 replaces: dilated
       stack emitting (y, z_all), loss = sum(y*cy) + sum(z*eps))
     - head-only fwd+bwd (deferred-skip matmul + postprocess + CE from a
       precomputed z_all input)
2. Dumps the optimized HLO of the full step (executable.as_text()) to
   /tmp/xla_step_hlo.txt and prints the biggest fusions' op content, so
   the long tail of per-layer fusions can be attributed.

Usage: python tools/r2_xla_analysis.py
"""

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from wavenet_tpu.models.config import paper_config
from wavenet_tpu.models.wavenet import init_params, _dilated_stack

B, SAMPLE = 8, 16000


def timed(tag, fn, reps=3, calls=10):
    out = fn()
    _ = np.asarray(jax.device_get(jax.tree.leaves(out)[0])).sum()
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(calls):
            out = fn()
        _ = np.asarray(jax.device_get(jax.tree.leaves(out)[0])).sum()
        times.append((time.perf_counter() - t0) / calls)
    dt = float(np.median(times))
    print(f"[{tag}] median {dt*1e3:.2f} ms "
          f"({[round(t*1e3,1) for t in times]})", flush=True)
    return dt


def main():
    print("device:", jax.devices()[0], flush=True)
    cfg = paper_config(compute_dtype="bfloat16")
    c = cfg
    L, D, R, S = c.num_layers, c.dilation_channels, \
        c.residual_channels, c.skip_channels
    params = init_params(jax.random.PRNGKey(0), cfg)
    T = cfg.receptive_field + SAMPLE
    rng = np.random.RandomState(0)
    audio = jnp.asarray(rng.uniform(-1, 1, (B, T)).astype(np.float32))
    x = jnp.asarray(rng.randn(B, T, R).astype(np.float32))
    cy = jnp.asarray(rng.randn(B, T, R).astype(np.float32))
    z_all = jnp.asarray(rng.randn(B, T, L * D).astype(np.float32)
                        ).astype(jnp.bfloat16)

    from wavenet_tpu.train_lib import (
        create_train_state, make_optimizer, make_train_step)
    opt = make_optimizer("adam", 1e-3)
    holder = {"state": create_train_state(jax.random.PRNGKey(0), cfg, opt)}
    step = make_train_step(cfg, opt, None)

    def run_full():
        s, m = step(holder["state"], audio)
        holder["state"] = s
        return m["loss"]

    timed("xla_full_step", run_full)

    # ---- stack only (mirrors what v3 stack benchmarks measure) ------
    import wavenet_tpu.models.wavenet as wn

    def stack_yz(p, xx):
        """Replicate _dilated_stack's layer loop, returning (y, z_all)."""
        current = xx.astype(jnp.bfloat16)
        gate_outs = []
        for i, dilation in enumerate(c.dilations):
            lp = {k: p[k][i] for k in
                  ["filter", "gate", "dense", "filter_bias", "gate_bias",
                   "dense_bias"]}
            w_cat = jnp.concatenate(
                [lp["filter"].astype(jnp.bfloat16),
                 lp["gate"].astype(jnp.bfloat16)], axis=-1)
            conv = wn.causal_conv_padded(current, w_cat, dilation,
                                         jax.lax.Precision.DEFAULT)
            conv = (conv
                    + jnp.concatenate([lp["filter_bias"], lp["gate_bias"]],
                                      -1).astype(jnp.bfloat16))
            out = jnp.tanh(conv[..., :D]) * jax.nn.sigmoid(conv[..., D:])
            tr = wn.conv1x1(out, lp["dense"].astype(jnp.bfloat16),
                            jax.lax.Precision.DEFAULT)
            current = current + tr + lp["dense_bias"].astype(jnp.bfloat16)
            gate_outs.append(out)
        return current, jnp.concatenate(gate_outs, -1)

    def stack_loss(p, xx):
        y, z = stack_yz(p, xx)
        return (jnp.sum(y.astype(jnp.float32) * cy)
                + jnp.sum(z.astype(jnp.float32)) * 1e-3)

    g_stack = jax.jit(lambda p, xx: sum(
        jnp.sum(t) for t in jax.tree.leaves(
            jax.grad(stack_loss, argnums=(0, 1))(p, xx))))
    timed("xla_stack_only_fwdbwd", lambda: g_stack(params, x))

    # ---- head only --------------------------------------------------
    enc = jnp.asarray(rng.randint(0, 256, (B, T)).astype(np.int32))

    def head_loss(p, z):
        w_skip = p["skip"].reshape(L * D, S).astype(jnp.bfloat16)
        skip = jnp.einsum("btc,co->bto", z, w_skip)
        skip = skip + jnp.sum(p["skip_bias"], axis=0).astype(jnp.bfloat16)
        h = jax.nn.relu(skip)
        h = jnp.einsum("btc,co->bto", h,
                       p["postprocess1"].astype(jnp.bfloat16))
        h = jax.nn.relu(h + p["postprocess1_bias"].astype(jnp.bfloat16))
        h = jnp.einsum("btc,co->bto", h,
                       p["postprocess2"].astype(jnp.bfloat16))
        h = (h + p["postprocess2_bias"].astype(jnp.bfloat16)).astype(
            jnp.float32)
        lse = jax.nn.log_softmax(h, axis=-1)
        return -jnp.mean(jnp.take_along_axis(lse, enc[..., None], -1))

    g_head = jax.jit(lambda p, z: sum(
        jnp.sum(t) for t in jax.tree.leaves(
            jax.grad(head_loss, argnums=(0, 1))(p, z))))
    timed("xla_head_only_fwdbwd", lambda: g_head(params, z_all))

    # ---- optimized HLO of the full step ------------------------------
    try:
        lowered = jax.jit(step).lower(holder["state"], audio)
        txt = lowered.compile().as_text()
        with open("/tmp/xla_step_hlo.txt", "w") as f:
            f.write(txt)
        print(f"HLO dumped: {len(txt)} chars -> /tmp/xla_step_hlo.txt",
              flush=True)
    except Exception as e:
        print(f"HLO dump failed: {type(e).__name__}: {str(e)[:200]}",
              flush=True)


if __name__ == "__main__":
    main()

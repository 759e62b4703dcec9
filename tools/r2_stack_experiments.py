"""Round-2 TPU experiment batch: streamed fused stack vs XLA.

One long process (tunnel discipline: one TPU process at a time). Order
matters: a failed Mosaic compile poisons the whole TPU client (observed:
every subsequent op errors), so the SAFE XLA baselines run and print
FIRST, and each risky Pallas variant runs after — if one dies, earlier
numbers are already on stdout.

Timing forces a full host readback — block_until_ready does not reliably
synchronize through the axon relay.

Usage: python tools/r2_stack_experiments.py [quick]
"""

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from wavenet_tpu.models.config import paper_config
from wavenet_tpu.models.wavenet import init_params
from wavenet_tpu.experiments.fused_stack import (
    fused_stack, pack_stack_weights)
from wavenet_tpu.experiments.fused_stack2 import fused_stack2, fused_stack2_forward
from wavenet_tpu.kernels.fused_stack3 import fused_stack3, fused_stack3_forward

QUICK = len(sys.argv) > 1 and sys.argv[1] == "quick"
B, SAMPLE = 8, 16000
REPS = 5 if not QUICK else 2

results = {}


def timed(tag, fn, reps=REPS, calls_per_rep=10):
    """Median per-call time; ``calls_per_rep`` dispatches amortize the
    tunnel relay's per-readback latency (~30 ms observed round 2 —
    single-call timings of an 18 ms step read ~50 ms)."""
    try:
        out = fn()
        _ = np.asarray(jax.device_get(jax.tree.leaves(out)[0])).sum()
        times = []
        for _i in range(reps):
            t0 = time.perf_counter()
            for _j in range(calls_per_rep):
                out = fn()
            _ = np.asarray(jax.device_get(jax.tree.leaves(out)[0])).sum()
            times.append((time.perf_counter() - t0) / calls_per_rep)
        dt = float(np.median(times))
        results[tag] = dt
        print(f"[{tag}] median {dt*1e3:.2f} ms  "
              f"({[round(t*1e3,1) for t in times]})", flush=True)
        return dt
    except Exception:
        print(f"[{tag}] FAILED:", flush=True)
        traceback.print_exc()
        results[tag] = None
        return None


def audio_sps(tag, dt):
    if dt:
        print(f"    -> {B * SAMPLE / 16000 / dt:.1f} audio-s/s", flush=True)


def main():
    print("device:", jax.devices()[0], flush=True)

    cfg = paper_config(compute_dtype="bfloat16")
    params = init_params(jax.random.PRNGKey(0), cfg)
    T = cfg.receptive_field + SAMPLE
    rng = np.random.RandomState(0)
    audio = jnp.asarray(rng.uniform(-1, 1, (B, T)).astype(np.float32))

    from wavenet_tpu.train_lib import (
        create_train_state, make_optimizer, make_train_step)

    def train_variant(tag, **cfg_kw):
        c = paper_config(compute_dtype="bfloat16", **cfg_kw)
        opt = make_optimizer("adam", 1e-3)
        holder = {"state": create_train_state(jax.random.PRNGKey(0), c, opt)}
        step = make_train_step(c, opt, None)

        # The train step DONATES its state: thread it through the holder,
        # or the second call passes a deleted buffer (surfaces as
        # INVALID_ARGUMENT through the relay and poisons the process).
        def run():
            s, m = step(holder["state"], audio)
            holder["state"] = s
            return m["loss"]

        dt = timed(tag, run)
        audio_sps(tag, dt)
        return dt

    # ---- SAFE baselines first --------------------------------------
    train_variant("xla_baseline")
    train_variant("xla_merged_fg", merged_filter_gate=True)

    # ---- risky Pallas work, cheapest-to-fail first ------------------
    # hardware parity check: v2 fwd vs v1 fwd (fp32, small T)
    cfg32 = paper_config()
    p32 = init_params(jax.random.PRNGKey(1), cfg32)
    x_small = jnp.asarray(
        rng.randn(1, 4000, cfg32.residual_channels).astype(np.float32))
    w_fg, wd, add, bd = pack_stack_weights(p32, cfg32, None, 1)
    try:
        y2, fgz = jax.jit(
            lambda x: fused_stack2_forward(x, w_fg, wd, add, bd, cfg32,
                                           jnp.float32, jnp.float32, 2048)
        )(x_small)
        y1, z1 = jax.jit(
            lambda x: fused_stack(x, w_fg, wd, add, bd, cfg32, jnp.float32)
        )(x_small)
        D = cfg32.dilation_channels
        z2 = np.asarray(fgz).reshape(1, 4000, -1, 128)[..., 2*D:3*D]
        err_y = float(jnp.max(jnp.abs(y2 - y1)))
        err_z = float(np.max(np.abs(z2.reshape(1, 4000, -1)
                                    - np.asarray(z1))))
        print(f"[parity fwd v2-vs-v1 on TPU] max|dy|={err_y:.2e} "
              f"max|dz|={err_z:.2e}", flush=True)
        results["parity_fwd_err"] = max(err_y, err_z)
    except Exception:
        print("[parity] FAILED:", flush=True)
        traceback.print_exc()
        return  # process likely poisoned

    # hardware grad parity: v2 vs v1 full VJP (fp32)
    try:
        cy = jnp.asarray(rng.randn(1, 4000, cfg32.residual_channels)
                         .astype(np.float32))
        cz = jnp.asarray(
            rng.randn(1, 4000, cfg32.num_layers * cfg32.dilation_channels)
            .astype(np.float32))

        def loss2(x, w):
            y, z = fused_stack2(x, w, wd, add, bd, cfg32, jnp.float32)
            return jnp.sum(y * cy) + jnp.sum(z * cz)

        def loss1(x, w):
            y, z = fused_stack(x, w, wd, add, bd, cfg32, jnp.float32)
            return jnp.sum(y * cy) + jnp.sum(z * cz)

        g2 = jax.jit(jax.grad(loss2, argnums=(0, 1)))(x_small, w_fg)
        g1 = jax.jit(jax.grad(loss1, argnums=(0, 1)))(x_small, w_fg)
        errs = [float(jnp.max(jnp.abs(a - b))) for a, b in zip(g2, g1)]
        scale = [float(jnp.max(jnp.abs(b))) for b in g1]
        print(f"[parity grad v2-vs-v1 on TPU] max|d|={errs} "
              f"(scales {scale})", flush=True)
        results["parity_grad_err"] = max(
            e / max(s, 1e-6) for e, s in zip(errs, scale))
    except Exception:
        print("[parity grad] FAILED:", flush=True)
        traceback.print_exc()
        return

    # ---- stack-only microbench: tile sweep for v2 -------------------
    x_big = jnp.asarray(
        rng.randn(B, T, cfg.residual_channels).astype(np.float32))
    w_fgB, wdB, addB, bdB = pack_stack_weights(params, cfg, None, B)
    cyB = jnp.asarray(rng.randn(*x_big.shape).astype(np.float32))

    # XLA stack-only reference (fwd+bwd through stack + deferred skip z use)
    from wavenet_tpu.models.wavenet import _dilated_stack

    def xla_stack_loss(x, p):
        logits = _dilated_stack(p, cfg, x, None, jnp.bfloat16,
                                jax.lax.Precision.DEFAULT)
        return jnp.sum(logits * 1e-3)

    # Reduce grads to ONE scalar inside jit: a full-leaf readback through
    # the axon relay costs ~700 ms of pure transfer and swamps the step.
    def scalarized(grad_fn):
        return jax.jit(lambda *a: sum(
            jnp.sum(t) for t in jax.tree.leaves(grad_fn(*a))))

    gx = scalarized(jax.grad(xla_stack_loss, argnums=0))
    timed("xla_stack+head_fwdbwd", lambda: gx(x_big, params))

    # ---- v3 (batch-folded) hardware parity, then tile sweep ---------
    # Parity first on a small shape: cheapest failure point.
    try:
        w_fg1, wd1, add1, bd1 = pack_stack_weights(p32, cfg32, None, 1)
        y3, fg3, z3 = jax.jit(
            lambda x: fused_stack3_forward(x, w_fg1, wd1, add1, bd1,
                                           cfg32, jnp.float32, jnp.float32,
                                           1024, True)
        )(x_small)
        y1, z1 = jax.jit(
            lambda x: fused_stack(x, w_fg1, wd1, add1, bd1, cfg32,
                                  jnp.float32)
        )(x_small)
        LD = cfg32.num_layers * cfg32.dilation_channels
        err_y = float(jnp.max(jnp.abs(y3 - y1)))
        err_z = float(np.max(np.abs(
            np.asarray(z3)[:, :4000].reshape(1, 4000, -1)[..., :LD]
            - np.asarray(z1))))
        print(f"[parity fwd v3-vs-v1 on TPU] max|dy|={err_y:.2e} "
              f"max|dz|={err_z:.2e}", flush=True)
        results["parity_fwd_v3_err"] = max(err_y, err_z)

        def loss3(x, w):
            y, z = fused_stack3(x, w, wd1, add1, bd1, cfg32, jnp.float32,
                                1024, 1024, True, False)
            return jnp.sum(y * cy) + jnp.sum(z[..., :LD] * cz)

        def loss1f(x, w):
            y, z = fused_stack(x, w, wd1, add1, bd1, cfg32, jnp.float32)
            return jnp.sum(y * cy) + jnp.sum(z * cz)

        g3 = jax.jit(jax.grad(loss3, argnums=(0, 1)))(x_small, w_fg1)
        g1 = jax.jit(jax.grad(loss1f, argnums=(0, 1)))(x_small, w_fg1)
        errs = [float(jnp.max(jnp.abs(a - b))) for a, b in zip(g3, g1)]
        scale = [float(jnp.max(jnp.abs(b))) for b in g1]
        print(f"[parity grad v3-vs-v1 on TPU] max|d|={errs} "
              f"(scales {scale})", flush=True)
        results["parity_grad_v3_err"] = max(
            e / max(s, 1e-6) for e, s in zip(errs, scale))
    except Exception:
        print("[parity v3] FAILED:", flush=True)
        traceback.print_exc()
        return

    tile_list3 = [(2048, 1024)] if QUICK else [
        (1024, 512), (2048, 1024), (2048, 2048), (4096, 1024),
        (4096, 2048)]
    for tf, tb in tile_list3:
        def stack3_loss(x, w, tf=tf, tb=tb):
            y, z = fused_stack3(x, w, wdB, addB, bdB, cfg, jnp.bfloat16,
                                tf, tb, True, False)
            return jnp.sum(y * cyB) + jnp.sum(z.astype(jnp.float32) * 1e-3)

        g = scalarized(jax.grad(stack3_loss, argnums=(0, 1)))
        dt = timed(f"v3_stack_fwdbwd_tf{tf}_tb{tb}",
                   lambda g=g: g(x_big, w_fgB))
        audio_sps(f"v3_stack tf{tf} tb{tb}", dt)

    # forward-only
    fwd3 = jax.jit(lambda x: jnp.sum(fused_stack3_forward(
        x, w_fgB, wdB, addB, bdB, cfg, jnp.bfloat16, jnp.bfloat16,
        2048, True)[0]))
    timed("v3_stack_fwdonly_tf2048", lambda: fwd3(x_big))

    # ---- full train step with the v3 / v2 stacks --------------------
    train_variant("pallas_v3_train", use_pallas_stack=True,
                  pallas_stack_version=3)
    if not QUICK:
        train_variant("pallas_v2_train", use_pallas_stack=True)

    print("\nRESULTS:", {k: (round(v, 4) if isinstance(v, float) else v)
                         for k, v in results.items()}, flush=True)


if __name__ == "__main__":
    main()

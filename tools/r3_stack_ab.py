#!/usr/bin/env python
"""Same-session A/B: XLA stack vs the v3 fused Pallas stack on the
MXU-friendly configs (VERDICT r2 #3a).

The round-2 "a Pallas training stack cannot beat XLA" proof is specific
to R=D=32 (K=32/64 matmuls, ~10% MXU). The wide (64/1024) and sharded
(80L/256ch) configs have K=128-512 shapes where that premise does not
hold — this measures the A/B nobody ran, per config, in one process.

    python tools/r3_stack_ab.py
"""

import gc
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/wavenet_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def measure(cfg, batch_size, sample_size=16000, n_steps=8):
    import time

    from wavenet_tpu.train_lib import (
        create_train_state, make_optimizer, make_train_step)
    from wavenet_tpu.utils.flops import mfu, train_step_flops

    optimizer = make_optimizer("adam", 1e-3)
    state = create_train_state(jax.random.PRNGKey(0), cfg, optimizer)
    step = make_train_step(cfg, optimizer, None)
    T = cfg.receptive_field + sample_size
    audio = jnp.asarray(np.random.RandomState(0).uniform(
        -1, 1, (batch_size, T)).astype(np.float32))
    state, metrics = step(state, audio)
    loss0 = float(jax.device_get(metrics["loss"]))
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = step(state, audio)
    loss1 = float(jax.device_get(metrics["loss"]))
    dt = (time.perf_counter() - t0) / n_steps
    rate = batch_size * sample_size / cfg.sample_rate / dt
    util = mfu(train_step_flops(cfg, batch_size, sample_size) / dt,
               str(jax.devices()[0].device_kind))
    return rate, util, dt, loss0, loss1


def main():
    from wavenet_tpu.models.config import (
        paper_config, sharded_config, wide_config)

    print("device:", jax.devices()[0], flush=True)
    import subprocess
    import sys

    # paper-v3 is omitted: the round-2 A/B already measured it losing
    # 2.5-3x at R=D=32, and its train-step compile was observed wedging
    # the compile service for 25+ min (2026-08-19). Each case runs in a
    # SUBPROCESS with its own timeout so one wedged compile cannot eat
    # the sweep.
    cases = [
        ("paper b8", "paper_config", "{}", 8),
        ("wide b2", "wide_config", "{}", 2),
        ("wide b8", "wide_config", "{}", 8),
        ("sharded b1", "sharded_config", "dict(remat=True)", 1),
        ("sharded b2", "sharded_config", "dict(remat=True)", 2),
    ]
    for tag, factory, kw, b in cases:
        for pallas in (False, True):
            if pallas and tag == "paper b8":
                continue
            child = (
                "import os, sys; sys.path.insert(0, {root!r});\n"
                "import jax;\n"
                "jax.config.update('jax_compilation_cache_dir',"
                " os.path.expanduser('~/.cache/wavenet_tpu_xla'));\n"
                "jax.config.update("
                "'jax_persistent_cache_min_compile_time_secs', 1.0);\n"
                "from wavenet_tpu.models.config import {factory};\n"
                "from tools.r3_stack_ab import measure;\n"
                "cfg = {factory}(compute_dtype='bfloat16',"
                " use_pallas_stack={pallas}, **{kw});\n"
                "print('CASE', measure(cfg, {b}), flush=True)\n"
            ).format(root=os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), factory=factory,
                pallas=pallas, kw=kw, b=b)
            try:
                proc = subprocess.run(
                    [sys.executable, "-c", child], timeout=900,
                    capture_output=True, text=True)
                line = next((ln for ln in proc.stdout.splitlines()
                             if ln.startswith("CASE")), None)
                if line:
                    rate, util, dt, l0, l1 = eval(line[5:])
                    print(f"{tag:<11} stack={'v3 ' if pallas else 'xla'}: "
                          f"{rate:8.1f} audio-s/s  mfu={util:.3f}  "
                          f"{dt * 1e3:7.2f} ms/step  "
                          f"loss {l0:.3f}->{l1:.3f}", flush=True)
                else:
                    tailmsg = proc.stderr.strip().splitlines()[-1][:140] \
                        if proc.stderr.strip() else f"rc={proc.returncode}"
                    print(f"{tag:<11} stack={'v3 ' if pallas else 'xla'}: "
                          f"FAILED {tailmsg}", flush=True)
            except subprocess.TimeoutExpired:
                print(f"{tag:<11} stack={'v3 ' if pallas else 'xla'}: "
                      f"TIMEOUT (900s — wedged compile)", flush=True)


if __name__ == "__main__":
    main()

"""Profile the XLA train step and the v3 Pallas stack on the real TPU.

Writes two jax.profiler traces (/tmp/prof_xla, /tmp/prof_v3), then parses
each trace.json.gz into a per-op self-time table so we can see where the
19.8 ms XLA step actually goes and what the Pallas kernel must beat.

One TPU process (tunnel discipline). Usage:
    python tools/r2_profile.py [xla|v3|parse]
"""

import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, SAMPLE = 8, 16000


def _readback(x):
    return np.asarray(jax.device_get(jax.tree.leaves(x)[0])).sum()


def profile_xla():
    from wavenet_tpu.models.config import paper_config
    from wavenet_tpu.train_lib import (
        create_train_state, make_optimizer, make_train_step)
    cfg = paper_config(compute_dtype="bfloat16")
    opt = make_optimizer("adam", 1e-3)
    state = create_train_state(jax.random.PRNGKey(0), cfg, opt)
    step = make_train_step(cfg, opt, None)
    rng = np.random.RandomState(0)
    audio = jnp.asarray(
        rng.uniform(-1, 1, (B, cfg.receptive_field + SAMPLE))
        .astype(np.float32))
    state, m = step(state, audio)          # compile
    _readback(m["loss"])
    with jax.profiler.trace("/tmp/prof_xla"):
        for _ in range(6):
            state, m = step(state, audio)
        _readback(m["loss"])
    print("xla trace done", flush=True)


def profile_v3():
    from wavenet_tpu.models.config import paper_config
    from wavenet_tpu.models.wavenet import init_params
    from wavenet_tpu.kernels.fused_stack3 import fused_stack3
    from wavenet_tpu.kernels.stack_pack import pack_stack_weights
    cfg = paper_config(compute_dtype="bfloat16")
    params = init_params(jax.random.PRNGKey(0), cfg)
    T = cfg.receptive_field + SAMPLE
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T, cfg.residual_channels)
                    .astype(np.float32))
    cy = jnp.asarray(rng.randn(B, T, cfg.residual_channels)
                     .astype(np.float32))
    w_fg, wd, add, bd = pack_stack_weights(params, cfg, None, B)

    def loss(x, w):
        y, z = fused_stack3(x, w, wd, add, bd, cfg, jnp.bfloat16,
                            1024, 512, True, False)
        return jnp.sum(y * cy) + jnp.sum(z.astype(jnp.float32) * 1e-3)

    g = jax.jit(lambda *a: sum(
        jnp.sum(t) for t in jax.tree.leaves(
            jax.grad(loss, argnums=(0, 1))(*a))))
    _readback(g(x, w_fg))                  # compile
    with jax.profiler.trace("/tmp/prof_v3"):
        for _ in range(6):
            out = g(x, w_fg)
        _readback(out)
    print("v3 trace done", flush=True)


def parse(trace_dir):
    paths = glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*trace.json.gz"))
    if not paths:
        print(f"no trace under {trace_dir}")
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # Identify device-side tracks (pid names containing "TPU"/"Device").
    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    device_pids = {p for p, n in pid_names.items()
                   if "TPU" in n or "Device" in n or "/device" in n.lower()}
    agg = collections.Counter()
    cnt = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        tname = tid_names.get((e["pid"], e.get("tid")), "")
        # Only leaf op tracks ("XLA Ops"); skip module/step summary rows.
        if "XLA Ops" not in tname and "Ops" not in tname:
            continue
        dur = float(e.get("dur", 0.0))
        agg[e["name"]] += dur
        cnt[e["name"]] += 1
        total += dur
    print(f"\n== {trace_dir} ({os.path.basename(path)}), "
          f"device op total {total/1e3:.2f} ms over trace ==")
    print(f"{'self ms':>9} {'%':>5} {'n':>5}  name")
    for name, dur in agg.most_common(45):
        print(f"{dur/1e3:9.3f} {100*dur/max(total,1e-9):5.1f} "
              f"{cnt[name]:5d}  {name[:110]}")
    # Track totals to sanity check which tracks exist.
    track_tot = collections.Counter()
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in device_pids:
            track_tot[tid_names.get((e["pid"], e.get("tid")), "?")] += \
                float(e.get("dur", 0.0))
    print("tracks:", {k: round(v / 1e3, 1)
                      for k, v in track_tot.most_common(10)})


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("xla", "all"):
        profile_xla()
    if which in ("v3", "all"):
        profile_v3()
    if which in ("parse",):
        parse("/tmp/prof_xla")
        parse("/tmp/prof_v3")
    if which == "all":
        parse("/tmp/prof_xla")
        parse("/tmp/prof_v3")

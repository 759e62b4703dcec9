"""Round-4: attribute the CLI-vs-jit-step training gap, phase by phase.

The round-3 verdict: the bench quotes 569 audio-s/s for the jit step
(b8/16k bf16, ~14 ms compute) but the real CLI soak ran at 53 ms/step
(~178 audio-s/s). Round 3's lagged loss readback recovered 17 ms; the
remaining ~39 ms was never attributed. This tool runs the REAL loop
pieces (reader dequeue -> shard_batch device_put -> dispatch -> lagged
device_get) on the real TPU with per-phase wall timers, plus a
block_until_ready probe for the true device compute time, so the gap
decomposes into named milliseconds.

Run alone — one TPU process at a time:
    python tools/r4_cli_overhead.py [--steps 100] [--lc] [--gc]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

CORPUS = "/tmp/ovh_corpus"


def ensure_corpus(lc: bool) -> str:
    if not os.path.isdir(CORPUS) or not any(
            f.endswith(".wav") for f in os.listdir(CORPUS)):
        subprocess.run([sys.executable, "tools/r3_make_corpus.py",
                        "--out", CORPUS, "--speakers", "2",
                        "--train-utts", "4", "--heldout-utts", "1",
                        "--secs", "4.0"], check=True,
                       cwd=os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))))
    if lc and not any(f.endswith(".lc.npy") for f in os.listdir(CORPUS)):
        subprocess.run([sys.executable, "-m", "wavenet_tpu.features",
                        CORPUS, "--n_mels", "80", "--hop", "200"],
                       check=True)
    return CORPUS


def main() -> None:
    import faulthandler
    faulthandler.dump_traceback_later(90, repeat=True)
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--sample_size", type=int, default=16000)
    ap.add_argument("--gc", action="store_true")
    ap.add_argument("--lc", action="store_true")
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/wavenet_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from wavenet_tpu.data.reader import AudioReader
    from wavenet_tpu.models.config import WaveNetConfig, paper_config
    from wavenet_tpu.parallel.sharding import make_mesh, shard_batch
    from wavenet_tpu.train_lib import (create_train_state, make_optimizer,
                                       make_train_step)

    ensure_corpus(args.lc)

    cfg_kw = dict(compute_dtype="bfloat16")
    if args.gc:
        cfg_kw.update(gc_channels=32, gc_cardinality=3)
    if args.lc:
        cfg_kw.update(lc_channels=80)
    base = paper_config()
    config = WaveNetConfig(**{**base.__dict__, **cfg_kw})

    reader = AudioReader(
        CORPUS, sample_rate=16000, gc_enabled=args.gc,
        receptive_field=config.receptive_field,
        sample_size=args.sample_size, silence_threshold=None, seed=7,
        lc_enabled=args.lc, lc_channels=80 if args.lc else None,
        lc_hop=200 if args.lc else None, lc_upsample="linear",
        lc_device_upsample=args.lc)
    reader.start_threads()

    optimizer = make_optimizer("adam", 1e-3)
    state = create_train_state(jax.random.PRNGKey(0), config, optimizer)
    mesh = make_mesh()
    from wavenet_tpu.parallel.sharding import shard_train_state
    state = shard_train_state(state, config, mesh)
    train_step = make_train_step(config, optimizer, None,
                                 lc_hop=200 if args.lc else None,
                                 lc_upsample="linear")

    # Warmup / compile.
    audio = reader.dequeue(args.batch_size)
    gc_ids = reader.dequeue_gc(args.batch_size) if args.gc else None
    lc = reader.dequeue_lc(args.batch_size) if args.lc else None
    a, g, l = shard_batch(audio, mesh, gc_ids, lc)
    state, metrics = train_step(state, a, g, l)
    jax.block_until_ready(metrics)

    # Probe 1: pure device compute (dispatch + block, reusing one batch).
    reps = 20
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    for _ in range(reps):
        state, metrics = train_step(state, a, g, l)
    jax.block_until_ready(metrics)
    t_compute = (time.perf_counter() - t0) / reps
    print(f"device compute (amortized, same batch): {t_compute*1e3:.2f} ms")

    # Probe 2: the real loop, phase-timed.
    t_deq = t_put = t_disp = t_get = t_other = 0.0
    pending = None
    wall0 = time.perf_counter()
    for step in range(args.steps):
        t = time.perf_counter()
        audio = reader.dequeue(args.batch_size)
        gc_ids = reader.dequeue_gc(args.batch_size) if args.gc else None
        lc = reader.dequeue_lc(args.batch_size) if args.lc else None
        t2 = time.perf_counter(); t_deq += t2 - t
        a, g, l = shard_batch(audio, mesh, gc_ids, lc)
        t3 = time.perf_counter(); t_put += t3 - t2
        state, metrics = train_step(state, a, g, l)
        t4 = time.perf_counter(); t_disp += t4 - t3
        if pending is not None:
            float(jax.device_get(pending["loss"]))
        t5 = time.perf_counter(); t_get += t5 - t4
        pending = metrics
        t_other += time.perf_counter() - t5
        print(f"step {step}: deq {(t2-t)*1e3:.1f} put {(t3-t2)*1e3:.1f} "
              f"disp {(t4-t3)*1e3:.1f} get {(t5-t4)*1e3:.1f} ms",
              flush=True)
    jax.block_until_ready(metrics)
    wall = time.perf_counter() - wall0
    n = args.steps
    out = {
        "config": {"gc": args.gc, "lc": args.lc, "b": args.batch_size,
                   "sample_size": args.sample_size},
        "ms_compute_same_batch": round(t_compute * 1e3, 2),
        "ms_per_step_wall": round(wall / n * 1e3, 2),
        "ms_dequeue": round(t_deq / n * 1e3, 2),
        "ms_device_put": round(t_put / n * 1e3, 2),
        "ms_dispatch": round(t_disp / n * 1e3, 2),
        "ms_lagged_device_get": round(t_get / n * 1e3, 2),
        "ms_other_host": round(t_other / n * 1e3, 2),
        "audio_sec_per_s": round(
            args.batch_size * args.sample_size / 16000 / (wall / n), 1),
    }
    print(json.dumps(out, indent=2))
    reader.stop_threads()


if __name__ == "__main__":
    main()

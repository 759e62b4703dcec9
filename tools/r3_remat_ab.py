#!/usr/bin/env python
"""Same-session A/B: remat on/off across batch sizes (VERDICT r2 #3b).

Round 2 measured the paper config's batch-scaling cliff — 536 audio-s/s
at b8 falling to 356 at b64 (activation residuals ~3 GB) — but never
A/B'd `remat` (jax.checkpoint over dilation layers) as the recovery.
This prints a table: config rows x {remat off, remat on}, audio-s/s and
MFU, all in one process back-to-back.

    python tools/r3_remat_ab.py
"""

import gc
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/wavenet_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench  # noqa: E402


def main():
    print("device:", jax.devices()[0], flush=True)
    for b in (8, 16, 32, 64):
        for remat in (False, True):
            gc.collect()
            try:
                rate, util = bench.bench_training(
                    batch_size=b, config_name="paper", remat=remat,
                    n_steps=8, with_mfu=True)
                print(f"paper b{b:<3} remat={int(remat)}: "
                      f"{rate:8.1f} audio-s/s  mfu={util:.3f}", flush=True)
            except Exception as e:  # noqa: BLE001 — report-and-continue
                print(f"paper b{b:<3} remat={int(remat)}: FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()

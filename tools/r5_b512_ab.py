"""Round-5 b512-vs-b256 adjudication (VERDICT r4 weak #1 / next #2).

The r4 DRIVER bench measured b512 [3.35, 3.68, 3.70]M samples/s LOSING
to b256 [4.17, 4.47, 4.26]M in the same process, while two builder
full-bench sessions saw a monotone ladder peaking at b512 (4.57M and
5.01M). Same code, same row order — so this is not bench ordering; it
is either (a) a bimodal b512 mode (allocation/placement sensitivity of
the ~800 MB HBM ring at 4-tile records), or (b) cross-measurement state
the driver session happened to hit.

This tool reproduces the exact bench ladder (b64 -> b128 -> b256 ->
b512, 3 reps each, 16k samples, bf16 weights, prefill) several times in
ONE process, with extra probes:
  * reversed order (b512 first) — does position matter?
  * gc.collect() before b512 — does freeing prior rows' buffers matter?
  * repeated b512 rows — is the mode sticky per-call or per-process?

Usage: python tools/r5_b512_ab.py [n_rounds]
"""

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/wavenet_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench  # noqa: E402


def row(B, tag, reps=3):
    t0 = time.perf_counter()
    rate, per_rep = bench.bench_generation_pallas(
        B, prefill=True, weight_dtype=jnp.bfloat16, reps=reps,
        with_reps=True)
    print(json.dumps({
        "tag": tag, "B": B, "rate_median": round(rate),
        "reps": [round(x) for x in per_rep],
        "wall_s": round(time.perf_counter() - t0, 1)}), flush=True)
    return rate


def main():
    n_rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)
    for r in range(n_rounds):
        # Exact bench ladder order.
        for B in (64, 128, 256, 512):
            row(B, f"ladder{r}")
        # b512 again right away: sticky mode or per-call?
        row(512, f"b512-again{r}")
        # After releasing everything the ladder left behind.
        gc.collect()
        row(512, f"b512-after-gc{r}")
        # Reversed pair.
        row(512, f"rev-b512-{r}")
        row(256, f"rev-b256-{r}")


if __name__ == "__main__":
    main()

"""Round-5 decode-latency isolation (VERDICT r4 next #2 + #3).

r5_b512_ab.py showed the prefill+decode generation rate is BIMODAL per
call at b256/b512 (~4.5-4.8M vs ~3.4-3.7M samples/s at b512), sticky
within a call's reps but randomly assigned per call. This tool isolates
WHERE the slow mode lives:

  * decode-only launches (teacher-forced streamed kernel on pre-built
    inputs; no prefill, no packing) with a FRESH zero ring per launch —
    if bimodal here, the decode kernel + its fresh HBM allocations are
    the locus;
  * carry-chain launches reusing the SAME donated ring across segments
    — if the mode is sticky along the chain, allocation PLACEMENT is
    the cause (the ring keeps its pages); if it still flips, the cause
    is elsewhere (e.g. per-launch stream allocations);
  * short vs long n_total to split fixed launch overhead from per-step
    rate.

Usage: python tools/r5_decode_latency.py [B ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from wavenet_tpu.models.config import paper_config
from wavenet_tpu.models.wavenet import init_params
from wavenet_tpu.kernels.sampler import (
    _io_chunk_for, _lanes, _run_sampler_kernel_hbm_stream,
    _stream_zero_state, pack_sampler_weights)


def launch(packed, forced_lanes, ring, causal, cfg, n_total, B, seed=0,
           t0=0, resume=False):
    t_start = time.perf_counter()
    codes, _, ring_out, causal_out = _run_sampler_kernel_hbm_stream(
        packed, forced_lanes, jnp.asarray([seed, t0], jnp.int32),
        ring, causal, cfg, n_total, n_total, B, 1.0, False, resume=resume)
    np.asarray(jax.device_get(codes[:, -1]))  # force full sync
    return time.perf_counter() - t_start, ring_out, causal_out


def launch_sampled(packed, ring, causal, cfg, n_total, B, seed=0):
    """Free-running decode: n_forced=1, so every step's input is the
    previous step's SAMPLE — the true autoregressive dependency chain
    (forced mode pipelines across steps and is ~3x faster; it is a
    throughput bound, not the production latency)."""
    C = _io_chunk_for(B)
    T_pad = -(-n_total // C) * C
    forced = jnp.zeros((T_pad, _lanes(B)), jnp.int32)
    t_start = time.perf_counter()
    codes, _, ring_out, causal_out = _run_sampler_kernel_hbm_stream(
        packed, forced, jnp.asarray([seed, 0], jnp.int32),
        ring, causal, cfg, n_total, 1, B, 1.0, False, resume=False)
    np.asarray(jax.device_get(codes[:, -1]))
    return time.perf_counter() - t_start


def main():
    batches = [int(x) for x in sys.argv[1:]] or [512, 256]
    cfg = paper_config()
    rng = np.random.RandomState(0)
    params = init_params(jax.random.PRNGKey(0), cfg)
    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)

    if os.environ.get("R5_SAMPLED"):
        for B in batches:
            packed = pack_sampler_weights(params, cfg, B,
                                          weight_dtype=jnp.bfloat16)
            for n_total in (8192,):
                us = []
                for trial in range(12):
                    ring, causal = _stream_zero_state(cfg, B)
                    dt = launch_sampled(packed, ring, causal, cfg,
                                        n_total, B)
                    if trial:
                        us.append(1e6 * dt / n_total)
                print(json.dumps({
                    "mode": "sampled-fresh-ring", "B": B,
                    "n_total": n_total,
                    "us_per_step": [round(u, 1) for u in us]}), flush=True)
        return

    for B in batches:
        packed = pack_sampler_weights(params, cfg, B,
                                      weight_dtype=jnp.bfloat16)
        for n_total in (2048, 8192):
            C = _io_chunk_for(B)
            T_pad = -(-n_total // C) * C
            forced = jnp.zeros((T_pad, _lanes(B)), jnp.int32)
            forced = forced.at[:n_total, 0:B].set(jnp.asarray(
                rng.randint(0, 256, (n_total, B))))

            # A: fresh zero ring per launch (new HBM alloc each time).
            us = []
            for trial in range(10):
                ring, causal = _stream_zero_state(cfg, B)
                dt, _, _ = launch(packed, forced, ring, causal, cfg,
                                  n_total, B)
                if trial:  # drop compile launch
                    us.append(1e6 * dt / n_total)
            print(json.dumps({
                "mode": "fresh-ring", "B": B, "n_total": n_total,
                "us_per_step": [round(u, 1) for u in us]}), flush=True)

            # B: carry chain — same donated ring pages reused.
            ring, causal = _stream_zero_state(cfg, B)
            us = []
            t_abs = 0
            for trial in range(10):
                dt, ring, causal = launch(packed, forced, ring, causal,
                                          cfg, n_total, B, t0=t_abs,
                                          resume=trial > 0)
                t_abs += n_total
                if trial:
                    us.append(1e6 * dt / n_total)
            print(json.dumps({
                "mode": "carry-chain", "B": B, "n_total": n_total,
                "us_per_step": [round(u, 1) for u in us]}), flush=True)


if __name__ == "__main__":
    main()
